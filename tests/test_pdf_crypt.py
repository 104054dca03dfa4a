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
