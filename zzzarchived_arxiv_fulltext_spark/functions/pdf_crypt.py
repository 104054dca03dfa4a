"""Standard-security-handler decryption for password-less PDFs.

A large share of crawled "encrypted" PDFs carry the PDF standard
security handler with an EMPTY user password — the file is readable by
anyone; the /Encrypt dictionary only encodes owner permissions (no
printing, no copying). The reference pipeline got these for free from
its poppler/pdfminer subprocesses (``extractor/fulltext/fulltext.py:81-109``);
this module restores that coverage for the stdlib parser:

- RC4 variants only (``/V`` 1 or 2, ``/R`` 2 or 3, plus ``/V 4`` when
  the crypt filter is ``/CFM /V2``). AES (``/CFM /AESV2``/``AESV3``,
  ``/R`` 5/6) and files whose empty-password authentication fails stay
  ``failure_class='encrypted'`` — detection remains the contract there.
- Decryption is OFFSET-PRESERVING: RC4 output length equals input
  length, so each stream body is deciphered in place and the
  ``/Encrypt`` trailer token blanked with spaces. The result is a
  byte-compatible plaintext PDF the existing lexical pipeline
  (``pdf_text.iter_streams`` et al.) consumes unchanged.

Implements PDF 1.7 spec (ISO 32000-1 §7.6.3) Algorithms 2 (file key),
4/5 (user-password check), 7 (owner-password check via user-key
recovery), and the per-object RC4 key of Algorithm 1.
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
    if v == 4:
        # only the RC4 crypt filter; /Identity streams need no work but
        # are rare enough to leave to the encrypted-failure path
        cfm = re.search(rb"/CFM\s*/(\w+)", body)
        if not cfm or cfm.group(1) != b"V2":
            return None
        stmf = re.search(rb"/StmF\s*/(\w+)", body)
        if stmf and stmf.group(1) not in (b"StdCF",):
            return None
    elif v not in (1, 2):
        return None
    if r not in (2, 3, 4):
        return None
    o, u = _dict_string(body, b"O"), _dict_string(body, b"U")
    p = _dict_int(body, b"P")
    if o is None or u is None or p is None or len(o) < 32:
        return None
    # a truncated /U would make the prefix comparison in
    # _authenticate_empty vacuously true (want[:0] == b"") and
    # "authenticate" garbage keys against malformed files — require
    # the full comparison width up front
    if len(u) < (32 if r == 2 else 16):
        return None
    length_bits = _dict_int(body, b"Length") or 40
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
        "v": v, "r": r, "o": o[:32], "u": u, "p": p,
        "length_bits": length_bits, "encrypt_metadata": encrypt_metadata,
        "id0": id0, "enc_obj": enc_obj,
    }


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


def _object_key(key: bytes, num: int, gen: int) -> bytes:
    """Algorithm 1 per-object RC4 key."""
    h = hashlib.md5(key + num.to_bytes(3, "little")
                    + gen.to_bytes(2, "little")).digest()
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


def decrypt_pdf(pdf: bytes) -> Optional[bytes]:
    """Plaintext-equivalent bytes for a password-less RC4 PDF.

    Returns None (leave ``failure_class='encrypted'``) for AES, real
    passwords, non-Standard handlers, or anything that fails to parse
    — never raises, so the ingestion router stays junk-safe.
    """
    try:
        params = _parse_encrypt_params(pdf)
        if params is None:
            return None
        key = _authenticate_empty(params)
        if key is None:
            return None
        out = _crypt_streams(pdf, key, params["enc_obj"],
                             params["encrypt_metadata"])
        # blank the trailer's /Encrypt reference (offset-preserving) so
        # is_encrypted() and downstream consumers see a normal file
        buf = bytearray(out)
        for em in _ENC_REF_RE.finditer(out):
            buf[em.start():em.end()] = b" " * (em.end() - em.start())
        for em in re.finditer(rb"/Encrypt(?=\s*<<)", out):
            buf[em.start():em.end()] = b" " * (em.end() - em.start())
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
