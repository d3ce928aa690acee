"""Standard ("basic") RC4 decryption of encrypted BIFF8 streams.

Implements MS-OFFCRYPTO 2.3.6 standard RC4 with the well-known default
password "VelvetSweatshop", as in the reference (xls/crypto/crypto.go,
xls/crypto/rc4.go): MD5-based Std97 key derivation, 1024-byte block
cipher rekeyed per block with MD5(key[:5] || block_le32), and verifier
check. Python's stdlib has no RC4, so the 20-line keystream is inlined.

CryptoAPI RC4 (FilePass etype 2-4) is unsupported in the reference
(xls/xls.go:221-224) and therefore unsupported here (error row).
"""

from __future__ import annotations

import hashlib
import struct

from .. import ExtractError

DEFAULT_XLS_PASSWORD = "VelvetSweatshop"

BLOCK = 1024


class RC4:
    """Plain RC4 keystream cipher."""

    __slots__ = ("S", "i", "j")

    def __init__(self, key: bytes):
        S = list(range(256))
        j = 0
        klen = len(key)
        for i in range(256):
            j = (j + S[i] + key[i % klen]) & 0xFF
            S[i], S[j] = S[j], S[i]
        self.S = S
        self.i = 0
        self.j = 0

    def crypt(self, data: bytes) -> bytes:
        S = self.S
        i, j = self.i, self.j
        out = bytearray(len(data))
        for k, b in enumerate(data):
            i = (i + 1) & 0xFF
            j = (j + S[i]) & 0xFF
            S[i], S[j] = S[j], S[i]
            out[k] = b ^ S[(S[i] + S[j]) & 0xFF]
        self.i, self.j = i, j
        return bytes(out)


def generate_std97_key(password: str, salt: bytes) -> bytes:
    """MS-OFFCRYPTO 2.3.6.2 intermediate key H1
    (xls/crypto/rc4.go:131-155)."""
    if not password or len(salt) != 16:
        raise ExtractError("xls: invalid keygen material")
    pass_bytes = password.encode("utf-16-le")
    h0 = hashlib.md5(pass_bytes).digest()
    m = hashlib.md5()
    for _ in range(16):
        m.update(h0[:5])
        m.update(salt)
    return m.digest()


class BasicRC4Decryptor:
    """Block-oriented decryptor matching the reference rc4Writer.

    Bytes are written in; every full 1024-byte block is decrypted with a
    cipher rekeyed as MD5(enc_key[:5] || uint32le(block))[:16].
    """

    def __init__(self, filepass_data: bytes,
                 password: str = DEFAULT_XLS_PASSWORD):
        if len(filepass_data) != 52:
            raise ExtractError(
                f"xls: data length is invalid (expected 52 bytes, got "
                f"{len(filepass_data)})")
        _major, minor = struct.unpack_from("<HH", filepass_data)
        if minor != 1:
            raise ExtractError(
                f"xls: unknown basic-RC4 minor version {minor}")
        salt = filepass_data[4:20]
        verifier = filepass_data[20:36]
        verifier_hash = filepass_data[36:52]

        self.enc_key = generate_std97_key(password, salt)
        self.block = 0
        self.pending = bytearray()
        self.out = bytearray()
        self._cipher: RC4 | None = None

        # verifier check (xls/crypto/rc4.go:99-115)
        c = self._block_cipher(0)
        temp1 = c.crypt(verifier)
        temp2 = c.crypt(verifier_hash)
        if hashlib.md5(temp1).digest() != temp2:
            raise ExtractError("xls: rc4 verification failed")

    def _block_cipher(self, block: int) -> RC4:
        key = self.enc_key[:5] + struct.pack("<I", block)
        return RC4(hashlib.md5(key).digest())

    def write(self, data: bytes) -> None:
        self.pending.extend(data)
        while len(self.pending) >= BLOCK:
            chunk = bytes(self.pending[:BLOCK])
            del self.pending[:BLOCK]
            c = self._block_cipher(self.block)
            self.out.extend(c.crypt(chunk))
            self.block += 1

    def flush(self) -> None:
        if self.pending:
            pad = BLOCK - len(self.pending)
            chunk = bytes(self.pending) + b"\x00" * pad
            self.pending.clear()
            c = self._block_cipher(self.block)
            self.out.extend(c.crypt(chunk)[: BLOCK - pad])
            self.block += 1

    def bytes(self) -> bytes:
        return bytes(self.out)
