"""Empty-password RC4 PDF decryption (VERDICT r4 #6).

The reference pipeline decrypted these implicitly through poppler
(``extractor/fulltext/fulltext.py:81-109`` shelling to pdftotext);
the stdlib parser now authenticates the standard security handler
with an empty user (or owner) password and deciphers streams in
place. Real passwords / AES stay ``failure_class='encrypted'``.
"""

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from zzzarchived_arxiv_fulltext_spark.functions.pdf_crypt import (
    decrypt_pdf,
    encrypt_pdf_rc4,
)
from zzzarchived_arxiv_fulltext_spark.functions.pdf_text import (
    count_pdf_images,
    extract_pdf_page_texts,
    is_encrypted,
    make_simple_pdf,
)

PAGES = [["Hello world.", "Second line here."], ["Page two text."]]


@pytest.mark.parametrize("r,bits", [(2, 40), (3, 40), (3, 128)])
def test_roundtrip_empty_user_password(r, bits):
    plain = make_simple_pdf(PAGES)
    base = extract_pdf_page_texts(plain)
    assert base  # fixture sanity

    enc = encrypt_pdf_rc4(plain, r=r, length_bits=bits)
    assert is_encrypted(enc)
    dec = decrypt_pdf(enc)
    assert dec is not None and not is_encrypted(dec)
    # the public extractor auto-decrypts
    assert extract_pdf_page_texts(enc) == base


def test_empty_owner_password_authenticates():
    plain = make_simple_pdf(PAGES)
    enc = encrypt_pdf_rc4(plain, r=3, owner_pw=b"", user_pw=b"")
    assert extract_pdf_page_texts(enc) == extract_pdf_page_texts(plain)


def test_real_user_password_stays_locked():
    plain = make_simple_pdf(PAGES)
    enc = encrypt_pdf_rc4(plain, r=3, user_pw=b"secret")
    assert decrypt_pdf(enc) is None
    assert extract_pdf_page_texts(enc) == []
    assert is_encrypted(enc)


def test_uncompressed_streams_roundtrip():
    plain = make_simple_pdf(PAGES, compress=False)
    enc = encrypt_pdf_rc4(plain, r=3)
    assert extract_pdf_page_texts(enc) == extract_pdf_page_texts(plain)


def test_image_count_survives_encryption():
    plain = make_simple_pdf(PAGES)
    assert count_pdf_images(encrypt_pdf_rc4(plain)) == \
        count_pdf_images(plain)


def test_decrypt_junk_safe_fixed():
    rng = random.Random(7)
    for _ in range(300):
        junk = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(500)))
        assert decrypt_pdf(junk) is None


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_decrypt_junk_safe_hypothesis(junk):
    # never raises; junk never masquerades as decryptable unless it
    # genuinely authenticates (vanishingly unlikely for random bytes)
    decrypt_pdf(junk)


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=200))
def test_decrypt_junk_with_encrypt_marker_safe(prefix):
    # adversarial: junk that LOOKS like it has an /Encrypt dict
    pdf = prefix + b"trailer << /Encrypt 1 0 R >> " + prefix
    decrypt_pdf(pdf)
    extract_pdf_page_texts(pdf)


def test_pdf_to_spans_decrypts_and_classifies(spark):
    from zzzarchived_arxiv_fulltext_spark.sources.pdf_ingest import (
        pdf_to_spans,
    )

    plain = make_simple_pdf(PAGES)
    rows = [
        ("open", bytearray(encrypt_pdf_rc4(plain, r=3))),
        ("locked", bytearray(encrypt_pdf_rc4(plain, r=3,
                                             user_pw=b"secret"))),
        ("plain", bytearray(plain)),
    ]
    df = spark.createDataFrame(rows, "doc_id string, pdf binary")
    got = {r["doc_id"]: r for r in pdf_to_spans(df).collect()}

    plain_texts = [s["text"] for s in got["plain"]["spans"]]
    open_texts = [s["text"] for s in got["open"]["spans"]]
    assert open_texts == plain_texts and plain_texts
    assert got["open"]["failure_class"] is None
    assert got["locked"]["failure_class"] == "encrypted"
    assert got["locked"]["spans"] == []


def test_truncated_u_entry_never_authenticates():
    """Review fix: an empty/short /U must not prefix-match vacuously
    and let a bogus key mangle a plaintext file."""
    plain = make_simple_pdf(PAGES)
    base = extract_pdf_page_texts(plain)
    fake = (plain + b"\ntrailer\n<< /Encrypt 99 0 R "
            b"/ID [<00112233445566778899aabbccddeeff> <00>] >>\n"
            b"99 0 obj\n<< /Filter /Standard /V 2 /R 3 /Length 128 "
            b"/P -44 /O <" + b"00" * 32 + b"> /U <> >>\nendobj\n")
    assert decrypt_pdf(fake) is None
    # the extractor must still read the (plaintext) streams unharmed
    assert extract_pdf_page_texts(fake) == base


@settings(max_examples=30, deadline=None)
@given(st.lists(
    st.lists(st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=0, max_size=40), min_size=1, max_size=4),
    min_size=1, max_size=3))
def test_roundtrip_fuzz_any_page_content(pages):
    """Whatever the page text, encrypt-then-extract must equal
    plain-extract (both r2/40-bit and r3/128-bit)."""
    plain = make_simple_pdf(pages)
    base = extract_pdf_page_texts(plain)
    for r, bits in ((2, 40), (3, 128)):
        assert extract_pdf_page_texts(
            encrypt_pdf_rc4(plain, r=r, length_bits=bits)) == base


# ---------------------------------------------------------------------------
# AES (V4 /AESV2, V5 R5/R6 /AESV3) — VERDICT r5 #2
# ---------------------------------------------------------------------------

from zzzarchived_arxiv_fulltext_spark.functions.pdf_crypt import (  # noqa: E402
    _aes_cbc,
    _aes_decrypt_block,
    _aes_encrypt_block,
    _expand_key,
    _object_key,
    encrypt_pdf_aes,
)


def test_aes_fips197_known_answers():
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    for key, want in [
        (bytes(range(16)), "69c4e0d86a7b0430d8cdb78070b4c55a"),
        (bytes(range(32)), "8ea2b7ca516745bfeafc49904b496089"),
    ]:
        rks, nr = _expand_key(key)
        ct = _aes_encrypt_block(pt, rks, nr)
        assert ct.hex() == want
        assert _aes_decrypt_block(ct, rks, nr) == pt


def test_aes_cbc_roundtrip():
    key, iv = bytes(range(32)), b"\x01" * 16
    data = bytes(range(96))
    assert _aes_cbc(key, iv, _aes_cbc(key, iv, data, True), False) == data


@pytest.mark.parametrize("variant,r", [("aesv2", 4), ("aesv3", 5),
                                       ("aesv3", 6)])
def test_aes_roundtrip_empty_user_password(variant, r):
    plain = make_simple_pdf(PAGES)
    base = extract_pdf_page_texts(plain)
    enc = encrypt_pdf_aes(plain, variant=variant, r=r)
    assert is_encrypted(enc)
    dec = decrypt_pdf(enc)
    assert dec is not None and not is_encrypted(dec)
    assert extract_pdf_page_texts(enc) == base


def test_aes_v5_empty_owner_password_authenticates():
    plain = make_simple_pdf(PAGES)
    enc = encrypt_pdf_aes(plain, variant="aesv3", r=6,
                          owner_pw=b"", user_pw=b"secret")
    assert extract_pdf_page_texts(enc) == extract_pdf_page_texts(plain)


@pytest.mark.parametrize("variant,r", [("aesv2", 4), ("aesv3", 6)])
def test_aes_real_password_stays_locked(variant, r):
    plain = make_simple_pdf(PAGES)
    enc = encrypt_pdf_aes(plain, variant=variant, r=r, user_pw=b"secret")
    assert decrypt_pdf(enc) is None
    assert is_encrypted(enc)
    assert extract_pdf_page_texts(enc) == []


def test_aes_uncompressed_streams_roundtrip():
    plain = make_simple_pdf(PAGES, compress=False)
    enc = encrypt_pdf_aes(plain, variant="aesv2")
    assert extract_pdf_page_texts(enc) == extract_pdf_page_texts(plain)


def test_encrypt_token_in_page_text_survives_decrypt():
    """ADVICE r5: /Encrypt blanking must be scoped to the trailer
    region — decrypted stream bodies may legitimately contain the
    token and were previously corrupted with spaces."""
    pages = [["See /Encrypt 5 0 R for details."]]
    plain = make_simple_pdf(pages, compress=False)
    enc = encrypt_pdf_aes(plain, variant="aesv3")
    assert extract_pdf_page_texts(enc) == extract_pdf_page_texts(plain)


def test_object_key_masks_oversized_ids():
    """ADVICE r5: object numbers >= 2^24 / generations >= 2^16 take
    the low-order 3/2 bytes (ISO 32000-1 Algorithm 1) instead of
    raising OverflowError."""
    key = bytes(range(16))
    big = _object_key(key, 2 ** 24 + 5, 2 ** 16 + 7)
    assert big == _object_key(key, 5, 7)
    assert len(big) == 16


def test_cf_sub_dict_length_does_not_shadow_top_level():
    """ADVICE r5: the byte-valued /Length inside /CF << /StdCF <<
    ... >> >> (written BEFORE the top-level bit-valued /Length by the
    fixture encryptor on purpose) must not mis-derive the key length.
    The aesv2 round-trip above only passes when the 128-bit top-level
    value wins; this pins the parse directly."""
    from zzzarchived_arxiv_fulltext_spark.functions.pdf_crypt import (
        _parse_encrypt_params,
    )

    plain = make_simple_pdf(PAGES)
    params = _parse_encrypt_params(encrypt_pdf_aes(plain, variant="aesv2"))
    assert params is not None
    assert params["length_bits"] == 128
    assert params["cipher"] == "aesv2"


@settings(max_examples=15, deadline=None)
@given(st.lists(
    st.lists(st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=0, max_size=40), min_size=1, max_size=4),
    min_size=1, max_size=2))
def test_aes_roundtrip_fuzz_any_page_content(pages):
    plain = make_simple_pdf(pages)
    base = extract_pdf_page_texts(plain)
    for variant in ("aesv2", "aesv3"):
        assert extract_pdf_page_texts(
            encrypt_pdf_aes(plain, variant=variant)) == base


def test_pdf_to_spans_decrypts_aes(spark):
    from zzzarchived_arxiv_fulltext_spark.sources.pdf_ingest import (
        pdf_to_spans,
    )

    plain = make_simple_pdf(PAGES)
    rows = [
        ("aes2", bytearray(encrypt_pdf_aes(plain, variant="aesv2"))),
        ("aes3", bytearray(encrypt_pdf_aes(plain, variant="aesv3"))),
        ("locked", bytearray(encrypt_pdf_aes(plain, variant="aesv3",
                                             user_pw=b"secret"))),
        ("plain", bytearray(plain)),
    ]
    df = spark.createDataFrame(rows, "doc_id string, pdf binary")
    got = {r["doc_id"]: r for r in pdf_to_spans(df).collect()}
    plain_texts = [s["text"] for s in got["plain"]["spans"]]
    assert plain_texts
    for k in ("aes2", "aes3"):
        assert [s["text"] for s in got[k]["spans"]] == plain_texts
        assert got[k]["failure_class"] is None
    assert got["locked"]["failure_class"] == "encrypted"
