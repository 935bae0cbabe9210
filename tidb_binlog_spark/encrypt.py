"""Config-password encryption — parity with the reference's
``pkg/encrypt`` (encrypt.go) and the ``binlogctl encrypt`` command
(binlogctl/encrypt.go): operators store downstream DB passwords
encrypted in drainer/arbiter configs, so decrypting an existing
deployment's config needs the exact same construction.

Wire format (encrypt.go:33,91-117):
    base64( iv(16) || "@" || AES-CFB(plaintext) )

- AES key: hex from ``$BINLOG_SECRET_KEY`` (16/24/32 bytes after
  decode), else the reference's well-known default key (a published
  constant — configs encrypted with it are obfuscated, not secret,
  which is why the reference logs a warning; we do the same).
- CFB is the full-block (128-bit segment) variant — Go's
  ``cipher.NewCFBEncrypter``.
- Decrypt validates the "@" separator before the payload
  (encrypt.go:120-140) and rejects short ciphertexts.
"""

from __future__ import annotations

import base64
import logging
import os
import secrets

from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

log = logging.getLogger(__name__)

# encrypt.go:31 — the published default key (obfuscation only)
_DEFAULT_SECRET_KEY = bytes.fromhex(
    "a529b7665997f043a30ac8fadcb51d6aa032c226ab5b7750530b12b8c1a16a48")
_IV_SEP = b"@"
_BLOCK = 16

_secret_key: bytes | None = None


def set_secret_key(key: bytes) -> None:
    """SetSecretKey (encrypt.go:56-65): AES-128/192/256 lengths only."""
    global _secret_key
    if len(key) not in (16, 24, 32):
        raise ValueError(f"secretKey not valid: {len(key)} bytes")
    _secret_key = key


def _key() -> bytes:
    if _secret_key is not None:
        return _secret_key
    hex_key = os.environ.get("BINLOG_SECRET_KEY", "")
    if not hex_key:
        log.warning("use the default secret key to encrypt")
        return _DEFAULT_SECRET_KEY
    key = bytes.fromhex(hex_key)
    if len(key) not in (16, 24, 32):
        raise ValueError(f"secretKey not valid: {len(key)} bytes")
    return key


def _cfb(key: bytes, iv: bytes, data: bytes, *, encrypt: bool) -> bytes:
    c = Cipher(algorithms.AES(key), modes.CFB(iv))
    ctx = c.encryptor() if encrypt else c.decryptor()
    return ctx.update(data) + ctx.finalize()


def encrypt(plaintext: str, iv: bytes | None = None) -> str:
    """-> base64(iv || "@" || cfb(plaintext)). ``iv`` is injectable
    for deterministic tests; production callers leave it None."""
    key = _key()
    iv = secrets.token_bytes(_BLOCK) if iv is None else iv
    if len(iv) != _BLOCK:
        raise ValueError("iv must be one AES block")
    body = _cfb(key, iv, plaintext.encode("utf-8"), encrypt=True)
    return base64.standard_b64encode(iv + _IV_SEP + body).decode("ascii")


def decrypt(ciphertext_b64: str) -> str:
    key = _key()
    raw = base64.standard_b64decode(ciphertext_b64)
    if len(raw) < _BLOCK + len(_IV_SEP):
        raise ValueError("ciphertext not valid")
    if raw[_BLOCK:_BLOCK + len(_IV_SEP)] != _IV_SEP:
        raise ValueError("ciphertext not valid: missing iv separator")
    iv, body = raw[:_BLOCK], raw[_BLOCK + len(_IV_SEP):]
    return _cfb(key, iv, body, encrypt=False).decode("utf-8")
