"""AES-GCM modular encryption (SURVEY.md §2 C12 — parquet modular
encryption analogue, plaintext-footer mode).

Public-format evidence: the parquet-format Encryption.md design — each
MODULE (here: every page) is encrypted independently with AES-GCM so page
projection/skipping still works; the footer stays plaintext (readable
schema/stats for planning) but carries a GCM signature so tampering is
detected when the key is presented; every module's AAD chains a per-file
random prefix + a module identifier so ciphertext cannot be relocated
across files, chunks, or page slots undetected.

Key hierarchy: the user supplies a MASTER key; every file encrypts under
its own DEK = HKDF-SHA256(master, per-file random salt) stored-salt-only in
the footer — the parquet DEK stance, which also keeps any one GCM key far
below the NIST 2^32 random-nonce bound at 10^12-document scale.

Layout choices (ours, not parquet bytes — SURVEY §7.0: decode-output parity
is the contract, not byte parity):
- page payload on disk = 12-byte random nonce || ciphertext || 16-byte tag
  (the page header's compressed_size covers all of it; the CRC is computed
  over the stored ciphertext so corruption is caught before decryption).
- page AAD = aad_prefix(8, per file) || md5(chunk_name)[:8] || group ordinal
  || <page_type u8, first_row i64, n_values i64, encoding u8, codec u8,
  n_nulls i64, uncompressed_size i64> — the full plaintext page-header
  identity, so a page moved to another file, column, or page slot AND any
  doctored header field (encoding/codec flip, null-count or size forgery)
  fails authentication.
- footer signature = GCM tag over the canonical footer JSON (signature
  field blanked) as AAD with empty plaintext and a random nonce; stored as
  base64(nonce || tag) inside footer["encryption"].

Scope notes (documented, honest): manifest min/max stats and bloom filters
remain plaintext in the footer (exactly parquet's plaintext-footer mode —
use full-footer encryption if stats themselves are sensitive, not
implemented here); clustered-mode shuffle spills are transient plaintext
(Spark's own shuffle has the same property); encrypted files never
byte-merge (per-file AAD prefixes) — compact via rewrite_encoded instead.
"""

from __future__ import annotations

import base64
import functools
import hashlib
import json
import os
import struct

# V2 = the full-page-header AAD layout (encoding/codec/n_nulls/usize + group
# ordinal in the chain). The V1->V2 bump was a LABEL correction only: the
# last V1-labeled writer already produced the V2 layout, so V1-labeled files
# stay readable (attempted with the current layout). Files from the earlier
# true-V1 layout fail their GCM check and get a format-version hint instead
# of only the generic wrong-key/tampered message.
ALGORITHM = "AES_GCM_V2"
_LEGACY_ALGORITHMS = {"AES_GCM_V1"}
NONCE_LEN = 12
TAG_LEN = 16
PAGE_OVERHEAD = NONCE_LEN + TAG_LEN
DEK_SALT_LEN = 16


@functools.lru_cache(maxsize=1024)
def derive_dek(master_key: bytes, salt: bytes) -> bytes:
    """Per-FILE data-encryption key: HKDF-SHA256(master, salt) — the parquet
    modular-encryption DEK stance. One long-lived master key at
    10^12-document scale would encrypt >2^32 pages, where random 96-bit GCM
    nonces hit the NIST birthday bound; per-file DEKs cap any one key at the
    pages of one file (~thousands). The salt is random per file and stored
    in the footer (it is not secret — the master key is)."""
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.kdf.hkdf import HKDF

    return HKDF(algorithm=hashes.SHA256(), length=32, salt=salt,
                info=b"webcodec-page-dek-v1").derive(check_key(master_key))


@functools.lru_cache(maxsize=1024)
def _cached_context(dek: bytes, prefix: bytes,
                    legacy_label: bool = False) -> "FileCrypto":
    return FileCrypto(dek, prefix, legacy_label=legacy_label)


_LEGACY_HINT = (
    "; note: this file is labeled AES_GCM_V1 — if it was written before the "
    "V2 AAD layout it cannot be read by this version (the V1 page-AAD "
    "construction is no longer implemented)"
)


def _aesgcm(key: bytes):
    try:
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM
    except ImportError as e:  # pragma: no cover — cryptography ships in-container
        raise RuntimeError(
            "encrypted webcodec tables require the 'cryptography' package"
        ) from e
    return AESGCM(key)


def check_key(key: bytes) -> bytes:
    if not isinstance(key, (bytes, bytearray)) or len(key) not in (16, 24, 32):
        raise ValueError("encryption_key must be 16/24/32 bytes (AES-128/192/256)")
    return bytes(key)


class FileCrypto:
    """Per-file encryption context: the key + this file's random AAD prefix."""

    __slots__ = ("key", "prefix", "_g", "legacy_label")

    def __init__(self, key: bytes, prefix: bytes, *,
                 legacy_label: bool = False):
        self.key = check_key(key)
        if len(prefix) != 8:
            raise ValueError("aad_prefix must be 8 bytes")
        self.prefix = bytes(prefix)
        self._g = _aesgcm(self.key)
        self.legacy_label = legacy_label

    def aad_base(self, chunk_name: str, group_ordinal: int = 0) -> bytes:
        """AAD prefix for one chunk of one row GROUP: the group ordinal is in
        the chain so same-slot pages in different groups of a multi-group
        file (write_batches output) cannot be swapped undetected."""
        return (self.prefix + hashlib.md5(chunk_name.encode()).digest()[:8]
                + struct.pack("<i", group_ordinal))

    def _page_aad(self, aad_base: bytes, ptype: int, first_row: int,
                  n_values: int, encoding: int, codec: int, n_nulls: int,
                  usize: int) -> bytes:
        # the FULL plaintext page-header identity is authenticated: the CRC
        # is attacker-recomputable, so without encoding/codec/n_nulls/usize
        # in the AAD a flipped encoding byte (e.g. PLAIN -> BYTE_STREAM_SPLIT,
        # both accept arbitrary same-length payloads) would pass CRC and GCM
        # and silently decode permuted values
        return aad_base + struct.pack(
            "<BqqBBqq", ptype, first_row, n_values, encoding, codec,
            n_nulls, usize,
        )

    def encrypt_page(self, aad_base: bytes, ptype: int, first_row: int,
                     n_values: int, payload: bytes, *, encoding: int = 0,
                     codec: int = 0, n_nulls: int = 0, usize: int = 0) -> bytes:
        nonce = os.urandom(NONCE_LEN)
        aad = self._page_aad(aad_base, ptype, first_row, n_values,
                             encoding, codec, n_nulls, usize)
        return nonce + self._g.encrypt(nonce, bytes(payload), aad)

    def decrypt_page(self, aad_base: bytes, ptype: int, first_row: int,
                     n_values: int, blob, *, encoding: int = 0,
                     codec: int = 0, n_nulls: int = 0, usize: int = 0) -> bytes:
        blob = bytes(blob)
        aad = self._page_aad(aad_base, ptype, first_row, n_values,
                             encoding, codec, n_nulls, usize)
        try:
            return self._g.decrypt(blob[:NONCE_LEN], blob[NONCE_LEN:], aad)
        except Exception as e:
            raise ValueError(
                "page decryption failed: wrong key, or the page was "
                "tampered with / relocated (GCM tag mismatch)"
                + (_LEGACY_HINT if self.legacy_label else "")
            ) from e


def _canonical_footer_bytes(footer: dict) -> bytes:
    enc = dict(footer["encryption"])
    enc["signature"] = ""
    doc = {**footer, "encryption": enc}
    return json.dumps(doc, sort_keys=True, separators=(",", ":"),
                      default=str).encode()


def sign_footer(key: bytes, footer: dict) -> str:
    """GCM signature (base64 nonce||tag) over the canonical footer JSON —
    call with footer["encryption"]["signature"] unset/blank."""
    nonce = os.urandom(NONCE_LEN)
    tag = _aesgcm(check_key(key)).encrypt(nonce, b"", _canonical_footer_bytes(footer))
    return base64.b64encode(nonce + tag).decode()


def verify_footer(key: bytes, footer: dict) -> None:
    sig = base64.b64decode(footer["encryption"]["signature"])
    nonce, tag = sig[:NONCE_LEN], sig[NONCE_LEN:]
    try:
        _aesgcm(check_key(key)).decrypt(nonce, tag, _canonical_footer_bytes(footer))
    except Exception as e:
        raise ValueError(
            "footer signature verification failed: wrong key or tampered footer"
        ) from e


_FOOTER_AAD = b"webcodec-footer-v1"
FOOTER_MODE_PLAINTEXT = "plaintext"
FOOTER_MODE_ENCRYPTED = "encrypted"


def encrypt_footer_blob(dek: bytes, footer_json: bytes) -> bytes:
    """Encrypted-footer mode (parquet EF analogue): the WHOLE footer JSON is
    GCM-encrypted under the file DEK — schema, chunk layout, stats and bloom
    filters are confidential, not just signed. Returns nonce || ct || tag."""
    nonce = os.urandom(NONCE_LEN)
    return nonce + _aesgcm(check_key(dek)).encrypt(nonce, footer_json, _FOOTER_AAD)


def decrypt_footer_blob(dek: bytes, blob) -> bytes:
    blob = bytes(blob)
    try:
        return _aesgcm(check_key(dek)).decrypt(blob[:NONCE_LEN],
                                               blob[NONCE_LEN:], _FOOTER_AAD)
    except Exception as e:
        raise ValueError(
            "footer decryption failed: wrong key or tampered footer"
        ) from e


def reader_context(footer: dict, key: bytes | None) -> FileCrypto | None:
    """Build the decryption context for a parsed footer (None when the file
    is plaintext): derive the file's DEK from the master key + stored salt,
    verify the footer signature under the DEK. Raises with the key_id in
    the message when the file is encrypted and no key was given."""
    enc = footer.get("encryption")
    if not enc:
        return None
    if key is None:
        raise ValueError(
            f"file is encrypted (algorithm={enc.get('algorithm')!r}, "
            f"key_id={enc.get('key_id')!r}); pass encryption_key"
        )
    alg = enc.get("algorithm")
    if alg != ALGORITHM and alg not in _LEGACY_ALGORITHMS:
        raise ValueError(f"unsupported encryption algorithm {alg!r}")
    legacy = alg != ALGORITHM
    dek = derive_dek(bytes(key), base64.b64decode(enc["dek_salt"]))
    if enc.get("footer_mode") != FOOTER_MODE_ENCRYPTED:
        # plaintext-footer mode authenticates via the GCM signature; in
        # encrypted-footer mode the whole-footer GCM already did (a parsed
        # footer can only come out of a successful decrypt_footer_blob)
        verify_footer(dek, footer)
    return _cached_context(dek, base64.b64decode(enc["aad_prefix"]),
                           legacy_label=legacy)
