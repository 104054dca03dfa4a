"""Standard-security-handler decryption for password-less PDFs.

A large share of crawled "encrypted" PDFs carry the PDF standard
security handler with an EMPTY user password — the file is readable by
anyone; the /Encrypt dictionary only encodes owner permissions (no
printing, no copying). The reference pipeline got these for free from
its poppler/pdfminer subprocesses (``extractor/fulltext/fulltext.py:81-109``);
this module restores that coverage for the stdlib parser:

- RC4 variants (``/V`` 1 or 2, ``/R`` 2-4, plus ``/V 4`` with
  ``/CFM /V2``): deciphered OFFSET-PRESERVING — RC4 output length
  equals input length, so each stream body is rewritten in place.
- AES variants (``/V 4`` + ``/CFM /AESV2``, ``/V 5`` ``/R`` 5/6 +
  ``/CFM /AESV3``): AES-CBC output is SHORTER than input (16-byte IV
  prefix + PKCS#5 padding), so the file is REBUILT — each stream body
  replaced by its plaintext and the direct ``/Length`` token updated.
  The downstream parser (``pdf_text.iter_streams``) is lexical, not
  xref-driven, so the shifted offsets are harmless. Post-2005 crawl
  PDFs are mostly AES; the reference got these free from poppler
  (``extractor/fulltext/fulltext.py:81-109``).
- Files whose empty-password authentication fails (real passwords)
  and non-Standard handlers stay ``failure_class='encrypted'`` —
  detection remains the contract there. Non-stream strings are left
  enciphered (they only carry metadata, never page content).

Implements ISO 32000-1 §7.6.3 Algorithms 1/1.A (per-object keys), 2
(file key), 4/5 (user-password check), 7 (owner-password check via
user-key recovery), and ISO 32000-2 §7.6.4.3.3/4 (R5/R6 SHA-2 based
authentication, hardened 2.B hash) with a self-contained AES-128/256
implementation (FIPS-197; pure Python — AES PDFs are a small slice of
any crawl and decrypt once at ingestion, so coverage beats cycles
here; a JVM/native cipher would be the production hot-path choice).
"""

import hashlib
import re
import struct
from typing import Optional

# 32-byte padding string from ISO 32000-1 Table / Algorithm 2
_PAD = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA01082E2E00B6D0683E802F0CA9FE6453697A")

_ENC_REF_RE = re.compile(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R")
_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.S)
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


def _rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _pad_pw(pw: bytes) -> bytes:
    return (pw + _PAD)[:32]


# ---------------------------------------------------------------------------
# AES-128/256 (FIPS-197), self-contained. Tables are generated at
# import from GF(2^8) arithmetic instead of pasted literals so the
# derivation is checkable; unit tests pin the FIPS-197 known-answer
# vectors.
# ---------------------------------------------------------------------------


def _gmul(a: int, b: int) -> int:
    p = 0
    while b:
        if b & 1:
            p ^= a
        a = ((a << 1) ^ 0x1B) & 0xFF if a & 0x80 else a << 1
        b >>= 1
    return p


def _build_aes_tables():
    exp, log = [0] * 256, [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gmul(x, 3)

    def rotl8(b, n):
        return ((b << n) | (b >> (8 - n))) & 0xFF

    sbox, inv_sbox = [0] * 256, [0] * 256
    for i in range(256):
        b = exp[(255 - log[i]) % 255] if i else 0
        s = b ^ rotl8(b, 1) ^ rotl8(b, 2) ^ rotl8(b, 3) ^ rotl8(b, 4) ^ 0x63
        sbox[i] = s
        inv_sbox[s] = i
    mul = {m: bytes(_gmul(i, m) for i in range(256))
           for m in (2, 3, 9, 11, 13, 14)}
    return bytes(sbox), bytes(inv_sbox), mul


_SBOX, _INV_SBOX, _MUL = _build_aes_tables()
_M2, _M3 = _MUL[2], _MUL[3]
_M9, _MB, _MD, _ME = _MUL[9], _MUL[11], _MUL[13], _MUL[14]


def _expand_key(key: bytes):
    """Round keys (16 bytes each) + round count for a 16/32-byte key."""
    nk = len(key) // 4
    nr = nk + 6
    w = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = [_SBOX[b] for b in t[1:] + t[:1]]
            t[0] ^= rcon
            rcon = _gmul(rcon, 2)
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([w[i - nk][j] ^ t[j] for j in range(4)])
    rks = [bytes(b for word in w[4 * r:4 * r + 4] for b in word)
           for r in range(nr + 1)]
    return rks, nr


def _aes_encrypt_block(block: bytes, rks, nr: int) -> bytes:
    s = bytearray(x ^ y for x, y in zip(block, rks[0]))
    for rnd in range(1, nr):
        t = bytearray(16)
        for c in range(4):
            for r in range(4):
                t[4 * c + r] = _SBOX[s[4 * ((c + r) & 3) + r]]
        rk = rks[rnd]
        for c in range(4):
            a0, a1, a2, a3 = t[4 * c:4 * c + 4]
            s[4 * c] = _M2[a0] ^ _M3[a1] ^ a2 ^ a3 ^ rk[4 * c]
            s[4 * c + 1] = a0 ^ _M2[a1] ^ _M3[a2] ^ a3 ^ rk[4 * c + 1]
            s[4 * c + 2] = a0 ^ a1 ^ _M2[a2] ^ _M3[a3] ^ rk[4 * c + 2]
            s[4 * c + 3] = _M3[a0] ^ a1 ^ a2 ^ _M2[a3] ^ rk[4 * c + 3]
    out = bytearray(16)
    rk = rks[nr]
    for c in range(4):
        for r in range(4):
            out[4 * c + r] = _SBOX[s[4 * ((c + r) & 3) + r]] ^ rk[4 * c + r]
    return bytes(out)


def _aes_decrypt_block(block: bytes, rks, nr: int) -> bytes:
    s = bytearray(x ^ y for x, y in zip(block, rks[nr]))
    for rnd in range(nr - 1, 0, -1):
        t = bytearray(16)
        for c in range(4):
            for r in range(4):
                t[4 * c + r] = _INV_SBOX[s[4 * ((c - r) & 3) + r]]
        rk = rks[rnd]
        u = bytes(x ^ y for x, y in zip(t, rk))
        for c in range(4):
            a0, a1, a2, a3 = u[4 * c:4 * c + 4]
            s[4 * c] = _ME[a0] ^ _MB[a1] ^ _MD[a2] ^ _M9[a3]
            s[4 * c + 1] = _M9[a0] ^ _ME[a1] ^ _MB[a2] ^ _MD[a3]
            s[4 * c + 2] = _MD[a0] ^ _M9[a1] ^ _ME[a2] ^ _MB[a3]
            s[4 * c + 3] = _MB[a0] ^ _MD[a1] ^ _M9[a2] ^ _ME[a3]
    out = bytearray(16)
    rk = rks[0]
    for c in range(4):
        for r in range(4):
            out[4 * c + r] = _INV_SBOX[s[4 * ((c - r) & 3) + r]] ^ rk[4 * c + r]
    return bytes(out)


def _aes_cbc(key: bytes, iv: bytes, data: bytes, encrypt: bool) -> bytes:
    """Raw AES-CBC over a 16-multiple ``data`` (no padding added)."""
    if len(data) % 16:
        raise ValueError("cbc input not block-aligned")
    rks, nr = _expand_key(key)
    out = bytearray()
    prev = iv
    if encrypt:
        for i in range(0, len(data), 16):
            blk = bytes(x ^ y for x, y in zip(data[i:i + 16], prev))
            prev = _aes_encrypt_block(blk, rks, nr)
            out += prev
    else:
        for i in range(0, len(data), 16):
            blk = data[i:i + 16]
            p = _aes_decrypt_block(blk, rks, nr)
            out += bytes(x ^ y for x, y in zip(p, prev))
            prev = blk
    return bytes(out)


def _dict_string(body: bytes, name: bytes) -> Optional[bytes]:
    """The string value of ``/name`` in a dict body — literal or hex."""
    from .pdf_text import _parse_hex_string, _parse_literal_string

    m = re.search(rb"/" + name + rb"\s*(?=[(<])", body)
    if not m:
        return None
    i = m.end()
    if body[i:i + 1] == b"(":
        val, _ = _parse_literal_string(body, i)
    else:
        val, _ = _parse_hex_string(body, i)
    return bytes(val)


def _dict_int(body: bytes, name: bytes) -> Optional[int]:
    m = re.search(rb"/" + name + rb"\s+(-?\d+)(?![\d.])", body)
    return int(m.group(1)) if m else None


def _object_slice(pdf: bytes, num: int, gen: int) -> Optional[bytes]:
    m = re.search(rb"(?<![0-9])%d\s+%d\s+obj\b" % (num, gen), pdf)
    if not m:
        return None
    end = pdf.find(b"endobj", m.end())
    return pdf[m.end():end if end >= 0 else len(pdf)]


def _parse_encrypt_params(pdf: bytes) -> Optional[dict]:
    """Locate and parse the /Encrypt dictionary + first /ID string.

    Returns None when there is no /Encrypt, the handler is not
    /Standard, or the cipher is not an RC4 variant this module covers.
    """
    t = pdf.rfind(b"trailer")
    region = pdf[t:] if t >= 0 else pdf
    enc_obj = None
    m = _ENC_REF_RE.search(region)
    if m:
        enc_obj = (int(m.group(1)), int(m.group(2)))
        body = _object_slice(pdf, *enc_obj)
        if body is None:
            return None
    else:
        im = re.search(rb"/Encrypt\s*<<", region)
        if not im:
            return None
        body = region[im.end() - 2:]  # flat-dict scan is enough below

    if not re.search(rb"/Filter\s*/Standard\b", body):
        return None
    v = _dict_int(body, b"V") or 1
    r = _dict_int(body, b"R") or (2 if v == 1 else 3)
    cipher = None
    if v in (1, 2) and r in (2, 3, 4):
        cipher = "rc4"
    elif v in (4, 5):
        # /Identity streams need no work but are rare enough to leave
        # to the encrypted-failure path
        cfm = re.search(rb"/CFM\s*/(\w+)", body)
        if not cfm:
            return None
        cipher = {b"V2": "rc4", b"AESV2": "aesv2",
                  b"AESV3": "aesv3"}.get(cfm.group(1))
        if cipher is None:
            return None
        if (v == 4 and cipher == "aesv3") or (v == 5 and cipher != "aesv3"):
            return None
        if v == 4 and r not in (2, 3, 4):
            return None
        if v == 5 and r not in (5, 6):
            return None
        stmf = re.search(rb"/StmF\s*/(\w+)", body)
        if stmf and stmf.group(1) not in (b"StdCF",):
            return None
    else:
        return None
    o, u = _dict_string(body, b"O"), _dict_string(body, b"U")
    p = _dict_int(body, b"P")
    if o is None or u is None or p is None or len(o) < 32:
        return None
    oe = ue = None
    if v == 5:
        # R5/R6: /O and /U are 48 bytes (hash + validation + key salt);
        # /OE and /UE hold the AES-wrapped 32-byte file key
        oe, ue = _dict_string(body, b"OE"), _dict_string(body, b"UE")
        if len(o) < 48 or len(u) < 48 or not oe or not ue \
                or len(oe) < 32 or len(ue) < 32:
            return None
    # a truncated /U would make the prefix comparison in
    # _authenticate_empty vacuously true (want[:0] == b"") and
    # "authenticate" garbage keys against malformed files — require
    # the full comparison width up front
    elif len(u) < (32 if r == 2 else 16):
        return None
    # the top-level bit-valued /Length, NOT the byte-valued /Length
    # inside the /CF << /StdCF << ... >> >> sub-dictionary (which is
    # often written first and was previously mis-picked — ADVICE r5);
    # when only the StdCF /Length exists, interpret it as bytes
    length_bits = _dict_int(_strip_cf_subdict(body), b"Length")
    if length_bits is None and v >= 4:
        cfl = _dict_int(body, b"Length")
        length_bits = cfl * 8 if cfl and cfl <= 40 else cfl
    if length_bits is None:
        length_bits = {4: 128, 5: 256}.get(v, 40)
    em = re.search(rb"/EncryptMetadata\s+(true|false)", body)
    encrypt_metadata = not (em and em.group(1) == b"false")

    id0 = b""
    idm = re.search(rb"/ID\s*\[\s*", region)
    if idm:
        from .pdf_text import _parse_hex_string, _parse_literal_string

        i = idm.end()
        if region[i:i + 1] == b"(":
            id0, _ = _parse_literal_string(region, i)
        elif region[i:i + 1] == b"<":
            id0, _ = _parse_hex_string(region, i)
        id0 = bytes(id0)
    return {
        "v": v, "r": r, "o": o[:48] if v == 5 else o[:32], "u": u, "p": p,
        "oe": oe[:32] if oe else None, "ue": ue[:32] if ue else None,
        "cipher": cipher,
        "length_bits": length_bits, "encrypt_metadata": encrypt_metadata,
        "id0": id0, "enc_obj": enc_obj,
    }


def _strip_cf_subdict(body: bytes) -> bytes:
    """``body`` with the balanced ``/CF << ... >>`` sub-dictionary
    removed, so top-level token scans can't land inside it."""
    m = re.search(rb"/CF\s*<<", body)
    if not m:
        return body
    depth, i = 1, m.end()
    while i < len(body) and depth:
        two = body[i:i + 2]
        if two == b"<<":
            depth, i = depth + 1, i + 2
        elif two == b">>":
            depth, i = depth - 1, i + 2
        else:
            i += 1
    return body[:m.start()] + body[i:]


def _file_key(padded_user: bytes, o: bytes, p: int, id0: bytes,
              r: int, n: int, encrypt_metadata: bool) -> bytes:
    """Algorithm 2: file encryption key from a PADDED user password."""
    h = hashlib.md5(padded_user + o + struct.pack("<I", p & 0xFFFFFFFF)
                    + id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def _user_check(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R>=3): expected /U for this file key."""
    if r == 2:
        return _rc4(key, _PAD)
    x = _rc4(key, hashlib.md5(_PAD + id0).digest())
    for i in range(1, 20):
        x = _rc4(bytes(b ^ i for b in key), x)
    return x


def _authenticate_empty(params: dict) -> Optional[bytes]:
    """File key for an empty USER password, else (Algorithm 7) for an
    empty OWNER password; None when neither authenticates."""
    r, o, u, p, id0 = (params["r"], params["o"], params["u"],
                       params["p"], params["id0"])
    n = 5 if r == 2 else max(5, min(16, params["length_bits"] // 8))
    em = params["encrypt_metadata"]

    key = _file_key(_PAD, o, p, id0, r, n, em)
    want = _user_check(key, id0, r)
    got = u[:32] if r == 2 else u[:16]
    if want[:len(got)] == got:
        return key

    # empty OWNER password: recover the padded user password from /O,
    # then run the user path with it
    d = hashlib.md5(_PAD).digest()
    if r >= 3:
        for _ in range(50):
            d = hashlib.md5(d).digest()
    rc4key = d[:n]
    if r == 2:
        padded_user = _rc4(rc4key, o)
    else:
        x = o
        for i in range(19, -1, -1):
            x = _rc4(bytes(b ^ i for b in rc4key), x)
        padded_user = x
    key = _file_key(padded_user[:32], o, p, id0, r, n, em)
    want = _user_check(key, id0, r)
    if want[:len(got)] == got:
        return key
    return None


def _hash_r6(password: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B hardened hash (R6)."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = _aes_cbc(k[:16], k[16:32], k1, encrypt=True)
        k = (hashlib.sha256, hashlib.sha384,
             hashlib.sha512)[sum(e[:16]) % 3](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _authenticate_empty_v5(params: dict) -> Optional[bytes]:
    """File key for an empty user/owner password under R5 (Adobe
    ExtensionLevel 3, single SHA-256) or R6 (ISO 32000-2, Algorithm
    2.B): validate the password hash against /U (or /O with the full
    48-byte /U as extra salt), then unwrap the 32-byte file key from
    /UE (or /OE) with AES-256-CBC, zero IV, no padding."""
    r, o, u = params["r"], params["o"], params["u"][:48]
    oe, ue = params["oe"], params["ue"]

    def h(pw: bytes, salt: bytes, udata: bytes) -> bytes:
        if r == 5:
            return hashlib.sha256(pw + salt + udata).digest()
        return _hash_r6(pw, salt, udata)

    if h(b"", u[32:40], b"") == u[:32]:
        ik = h(b"", u[40:48], b"")
        return _aes_cbc(ik, b"\x00" * 16, ue, encrypt=False)
    if h(b"", o[32:40], u) == o[:32]:
        ik = h(b"", o[40:48], u)
        return _aes_cbc(ik, b"\x00" * 16, oe, encrypt=False)
    return None


def _object_key(key: bytes, num: int, gen: int, aes: bool = False) -> bytes:
    """Algorithm 1 per-object key (low-order 3/2 bytes of num/gen per
    ISO 32000-1 — masked, so object numbers >= 2^24 don't raise
    OverflowError and torpedo the whole file; ADVICE r5). AES (V4
    /AESV2) appends the "sAlT" constant to the hash input."""
    h = hashlib.md5(key + (num & 0xFFFFFF).to_bytes(3, "little")
                    + (gen & 0xFFFF).to_bytes(2, "little")
                    + (b"sAlT" if aes else b"")).digest()
    return h[:min(len(key) + 5, 16)]


def _stream_data_span(pdf: bytes, obj_start: int, obj_dict: bytes,
                      dict_end: int) -> Optional[tuple]:
    """(start, end) byte span of one stream body — the same slice
    ``pdf_text.iter_streams`` will read (declared /Length when direct
    and sane, else the lexical endstream slice minus trailing EOL)."""
    start = dict_end
    send = pdf.find(b"endstream", start)
    if send < 0:
        return None
    lm = re.search(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)", obj_dict)
    if lm and start + int(lm.group(1)) <= send:
        return start, start + int(lm.group(1))
    end = send
    seg = pdf[start:send]
    if seg.endswith(b"\r\n"):
        end -= 2
    elif seg.endswith(b"\n") or seg.endswith(b"\r"):
        end -= 1
    return start, end


def _crypt_streams(pdf: bytes, key: bytes, enc_obj,
                   encrypt_metadata: bool) -> bytes:
    """RC4 every stream body in place with its per-object key (RC4 is
    its own inverse, so this both encrypts and decrypts)."""
    out = bytearray(pdf)
    pos = 0
    for m in _OBJ_RE.finditer(pdf):
        if m.start() < pos:  # inside a previous stream body
            continue
        num, gen = int(m.group(1)), int(m.group(2))
        end = pdf.find(b"endobj", m.end())
        if end < 0:
            end = len(pdf)
        if (num, gen) == enc_obj:
            pos = end
            continue
        sm = _STREAM_RE.search(pdf, m.end(), end)
        if not sm:
            pos = end
            continue
        obj_dict = sm.group(1)
        # cross-reference streams are never encrypted; XMP metadata is
        # plaintext when EncryptMetadata is false
        if re.search(rb"/Type\s*/XRef\b", obj_dict) or (
                not encrypt_metadata
                and re.search(rb"/Type\s*/Metadata\b", obj_dict)):
            pos = end
            continue
        span = _stream_data_span(pdf, m.end(), obj_dict, sm.end())
        if span:
            s, e = span
            out[s:e] = _rc4(_object_key(key, num, gen), pdf[s:e])
            pos = max(end, e)
        else:
            pos = end
    return bytes(out)


_DIRECT_LEN_RE = re.compile(rb"(/Length\s+)(\d+)(?!\d)(?!\s+\d+\s+R)")


def _rebuild_streams(pdf: bytes, enc_obj, encrypt_metadata: bool,
                     transform) -> bytes:
    """Rewrite every stream body via ``transform(body, num, gen)`` and
    update the direct ``/Length`` token to the new body length.

    AES-CBC changes stream length (IV prefix + padding), so unlike the
    RC4 path this is NOT offset-preserving — safe because the
    downstream parser (``pdf_text.iter_streams``) is lexical rather
    than xref-driven. ``transform`` returning None leaves that stream
    untouched. Indirect ``/Length n 0 R`` dicts are left alone: the
    parser already falls back to the lexical endstream slice for those.
    """
    out = []
    copied = 0  # pdf[:copied] is already emitted
    guard = 0   # skip obj-token matches inside handled regions
    for m in _OBJ_RE.finditer(pdf):
        if m.start() < guard:
            continue
        num, gen = int(m.group(1)), int(m.group(2))
        end = pdf.find(b"endobj", m.end())
        if end < 0:
            end = len(pdf)
        guard = end
        if enc_obj and (num, gen) == enc_obj:
            continue
        sm = _STREAM_RE.search(pdf, m.end(), end)
        if not sm:
            continue
        obj_dict = sm.group(1)
        if re.search(rb"/Type\s*/XRef\b", obj_dict) or (
                not encrypt_metadata
                and re.search(rb"/Type\s*/Metadata\b", obj_dict)):
            continue
        span = _stream_data_span(pdf, m.end(), obj_dict, sm.end())
        if not span:
            continue
        s, e = span
        new_body = transform(pdf[s:e], num, gen)
        if new_body is None:
            continue
        dict_part = _DIRECT_LEN_RE.sub(
            lambda mm: mm.group(1) + str(len(new_body)).encode(),
            pdf[m.end():sm.end()], count=1)
        out += [pdf[copied:m.end()], dict_part, new_body]
        copied = e
        guard = max(end, e)
    out.append(pdf[copied:])
    return b"".join(out)


def _aes_stream_cipher(fkey: bytes, cipher: str, encrypt: bool,
                       iv_seed: bytes = b""):
    """``transform(body, num, gen)`` for :func:`_rebuild_streams`.

    Decrypt: body = IV || ciphertext, PKCS#5 padding stripped.
    Encrypt (fixtures): deterministic per-object IV from ``iv_seed``.
    Per ISO 32000 the object key is the file key itself for /AESV3 and
    the Algorithm 1 MD5-with-sAlT key for /AESV2.
    """
    def transform(body: bytes, num: int, gen: int):
        key = fkey if cipher == "aesv3" else _object_key(
            fkey, num, gen, aes=True)
        if encrypt:
            iv = hashlib.md5(iv_seed + b"%d/%d" % (num, gen)).digest()
            pad = 16 - len(body) % 16
            return iv + _aes_cbc(key, iv, body + bytes([pad]) * pad, True)
        if len(body) < 32 or (len(body) - 16) % 16:
            return None  # not a well-formed AES-CBC stream; leave as-is
        pt = _aes_cbc(key, body[:16], body[16:], False)
        pad = pt[-1]
        return pt[:-pad] if 1 <= pad <= 16 else pt

    return transform


def decrypt_pdf(pdf: bytes) -> Optional[bytes]:
    """Plaintext-equivalent bytes for a password-less RC4/AES PDF.

    Returns None (leave ``failure_class='encrypted'``) for real
    passwords, non-Standard handlers, or anything that fails to parse
    — never raises, so the ingestion router stays junk-safe.
    """
    try:
        params = _parse_encrypt_params(pdf)
        if params is None:
            return None
        cipher = params["cipher"]
        if cipher == "aesv3":
            key = _authenticate_empty_v5(params)
        else:
            key = _authenticate_empty(params)
        if key is None:
            return None
        if cipher == "rc4":
            out = _crypt_streams(pdf, key, params["enc_obj"],
                                 params["encrypt_metadata"])
        else:
            out = _rebuild_streams(
                pdf, params["enc_obj"], params["encrypt_metadata"],
                _aes_stream_cipher(key, cipher, encrypt=False))
        # blank the /Encrypt reference so is_encrypted() and downstream
        # consumers see a normal file — scoped to the region after the
        # last `trailer` keyword, mirroring is_encrypted's scan; the
        # stream bodies are now PLAINTEXT and may legitimately contain
        # the token (ADVICE r5: blanking the whole file corrupted such
        # content). No trailer keyword (xref-stream files) → whole file.
        t = out.rfind(b"trailer")
        base = t if t >= 0 else 0
        buf = bytearray(out)
        for em in _ENC_REF_RE.finditer(out, base):
            buf[em.start():em.end()] = b" " * (em.end() - em.start())
        for em in re.finditer(rb"/Encrypt(?=\s*<<)", out[base:]):
            buf[base + em.start():base + em.end()] = b" " * (
                em.end() - em.start())
        return bytes(buf)
    except Exception:
        return None


# ---------------------------------------------------------------------------
# Fixture encryptor (tests): the exact inverse pipeline, so round-trip
# tests exercise real key derivation instead of canned ciphertext.
# ---------------------------------------------------------------------------


def encrypt_pdf_rc4(pdf: bytes, r: int = 3, length_bits: int = 128,
                    owner_pw: bytes = b"owner",
                    user_pw: bytes = b"") -> bytes:
    """Encrypt a plaintext PDF (e.g. ``make_simple_pdf`` output) with
    the standard security handler — RC4, ``r`` 2 or 3."""
    if r == 2:
        v, n, length_bits = 1, 5, 40
    else:
        v, n = 2, length_bits // 8
    # /O (Algorithm 3)
    d = hashlib.md5(_pad_pw(owner_pw or user_pw)).digest()
    if r >= 3:
        for _ in range(50):
            d = hashlib.md5(d).digest()
    rc4key = d[:n]
    o = _rc4(rc4key, _pad_pw(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in rc4key), o)
    p = -44
    id0 = hashlib.md5(pdf).digest()
    key = _file_key(_pad_pw(user_pw), o, p, id0, r, n, True)
    u = _user_check(key, id0, r)
    if r >= 3:
        u = u + b"\x00" * 16

    body = _crypt_streams(pdf, key, None, True)
    num = max((int(m.group(1)) for m in _OBJ_RE.finditer(pdf)),
              default=0) + 1
    enc = (b"%d 0 obj\n<< /Filter /Standard /V %d /R %d /Length %d "
           b"/P %d /O <%s> /U <%s> >>\nendobj\n"
           % (num, v, r, length_bits, p, o.hex().encode(),
              u.hex().encode()))
    trailer = (b"trailer\n<< /Encrypt %d 0 R /ID [<%s> <%s>] >>\n"
               % (num, id0.hex().encode(), id0.hex().encode()))
    return body + b"\n" + enc + trailer


def encrypt_pdf_aes(pdf: bytes, variant: str = "aesv3", r: int = None,
                    owner_pw: bytes = b"owner",
                    user_pw: bytes = b"") -> bytes:
    """Encrypt a plaintext PDF with the standard security handler and
    AES — ``variant='aesv2'`` (V4/R4, AES-128) or ``'aesv3'`` (V5 with
    R5 or R6, AES-256). Deterministic (IVs/salts derived from the file
    digest) so fixtures are stable. The /CF sub-dictionary is written
    BEFORE the top-level /Length on purpose: it pins the parse fix for
    the byte-valued StdCF /Length shadowing the bit-valued one."""
    id0 = hashlib.md5(pdf).digest()
    p = -44
    num = max((int(m.group(1)) for m in _OBJ_RE.finditer(pdf)),
              default=0) + 1
    if variant == "aesv2":
        r = 4 if r is None else r
        n = 16
        d = hashlib.md5(_pad_pw(owner_pw or user_pw)).digest()
        for _ in range(50):
            d = hashlib.md5(d).digest()
        rc4key = d[:n]
        o = _rc4(rc4key, _pad_pw(user_pw))
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in rc4key), o)
        key = _file_key(_pad_pw(user_pw), o, p, id0, r, n, True)
        u = _user_check(key, id0, r) + b"\x00" * 16
        body = _rebuild_streams(
            pdf, None, True, _aes_stream_cipher(key, "aesv2", True, id0))
        enc = (b"%d 0 obj\n<< /Filter /Standard /V 4 /R %d "
               b"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
               b"/StmF /StdCF /StrF /StdCF /Length 128 "
               b"/P %d /O <%s> /U <%s> >>\nendobj\n"
               % (num, r, p, o.hex().encode(), u.hex().encode()))
        trailer = (b"trailer\n<< /Encrypt %d 0 R /ID [<%s> <%s>] >>\n"
                   % (num, id0.hex().encode(), id0.hex().encode()))
        return body + b"\n" + enc + trailer

    r = 6 if r is None else r

    def h(pw, salt, udata):
        if r == 5:
            return hashlib.sha256(pw + salt + udata).digest()
        return _hash_r6(pw, salt, udata)

    fkey = hashlib.sha256(b"spark-graft-aes-fixture" + id0).digest()
    uvs, uks = (hashlib.md5(b"uv" + id0).digest()[:8],
                hashlib.md5(b"uk" + id0).digest()[:8])
    ovs, oks = (hashlib.md5(b"ov" + id0).digest()[:8],
                hashlib.md5(b"ok" + id0).digest()[:8])
    u = h(user_pw, uvs, b"") + uvs + uks
    ue = _aes_cbc(h(user_pw, uks, b""), b"\x00" * 16, fkey, True)
    o = h(owner_pw, ovs, u) + ovs + oks
    oe = _aes_cbc(h(owner_pw, oks, u), b"\x00" * 16, fkey, True)
    body = _rebuild_streams(
        pdf, None, True, _aes_stream_cipher(fkey, "aesv3", True, id0))
    enc = (b"%d 0 obj\n<< /Filter /Standard /V 5 /R %d "
           b"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
           b"/StmF /StdCF /StrF /StdCF /Length 256 "
           b"/P %d /O <%s> /U <%s> /OE <%s> /UE <%s> >>\nendobj\n"
           % (num, r, p, o.hex().encode(), u.hex().encode(),
              oe.hex().encode(), ue.hex().encode()))
    trailer = b"trailer\n<< /Encrypt %d 0 R >>\n" % num
    return body + b"\n" + enc + trailer
