"""Minimal LZ4 frame format support (the `lz4` python module is not in the
image; the reference writes `.prob.lz4` via the lz4 crate,
`write_function.rs:259-261`).

Writer emits a spec-compliant LZ4 frame. Blocks are LZ4-block-compressed
with a greedy hash-match compressor; blocks that don't shrink are stored
uncompressed (high-bit flag), which the format allows. A decoder is
included for round-trip tests.
"""

from __future__ import annotations

import struct

_MAGIC = 0x184D2204
_PRIME1 = 2654435761
_PRIME2 = 2246822519
_PRIME3 = 3266489917
_PRIME4 = 668265263
_PRIME5 = 374761393
_MASK = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK


def xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 (needed for the frame header checksum)."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _PRIME1 + _PRIME2) & _MASK
        v2 = (seed + _PRIME2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _PRIME1) & _MASK
        while i <= n - 16:
            for j, v in enumerate((v1, v2, v3, v4)):
                (lane,) = struct.unpack_from("<I", data, i + 4 * j)
                v = (v + lane * _PRIME2) & _MASK
                v = _rotl(v, 13)
                v = (v * _PRIME1) & _MASK
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 16
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
    else:
        h = (seed + _PRIME5) & _MASK
    h = (h + n) & _MASK
    while i <= n - 4:
        (lane,) = struct.unpack_from("<I", data, i)
        h = (h + lane * _PRIME3) & _MASK
        h = (_rotl(h, 17) * _PRIME4) & _MASK
        i += 4
    while i < n:
        h = (h + data[i] * _PRIME5) & _MASK
        h = (_rotl(h, 11) * _PRIME1) & _MASK
        i += 1
    h ^= h >> 15
    h = (h * _PRIME2) & _MASK
    h ^= h >> 13
    h = (h * _PRIME3) & _MASK
    h ^= h >> 16
    return h


def _compress_block(src: bytes) -> bytes:
    """Greedy LZ4 block compression (hash table of 4-byte sequences)."""
    n = len(src)
    if n < 13:
        return b""  # too small to compress; caller stores raw
    out = bytearray()
    table = {}
    anchor = 0
    i = 0
    limit = n - 12  # last match must start before the 12-byte end margin
    while i < limit:
        seq = src[i : i + 4]
        cand = table.get(seq)
        table[seq] = i
        if cand is not None and i - cand <= 0xFFFF and src[cand : cand + 4] == seq:
            # extend match
            m = i + 4
            c = cand + 4
            end = n - 5
            while m < end and src[m] == src[c]:
                m += 1
                c += 1
            lit_len = i - anchor
            match_len = m - i - 4  # stored length is len-4
            token_lit = 15 if lit_len >= 15 else lit_len
            token_match = 15 if match_len >= 15 else match_len
            out.append((token_lit << 4) | token_match)
            rem = lit_len - 15
            while rem >= 0:
                out.append(255 if rem >= 255 else rem)
                rem -= 255
            out += src[anchor:i]
            out += struct.pack("<H", i - cand)
            rem = match_len - 15
            while rem >= 0:
                out.append(255 if rem >= 255 else rem)
                rem -= 255
            anchor = m
            i = m
        else:
            i += 1
    # final literals
    lit_len = n - anchor
    token_lit = 15 if lit_len >= 15 else lit_len
    out.append(token_lit << 4)
    rem = lit_len - 15
    while rem >= 0:
        out.append(255 if rem >= 255 else rem)
        rem -= 255
    out += src[anchor:]
    return bytes(out)


def _decompress_block(src: bytes, max_out: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(src)
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        out += src[i : i + lit]
        i += lit
        if i >= n:
            break
        (offset,) = struct.unpack_from("<H", src, i)
        i += 2
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - offset
        for k in range(mlen):
            out.append(out[start + k])
        if len(out) > max_out:
            raise ValueError("corrupt LZ4 block")
    return bytes(out)


BLOCK_MAX = 4 << 20  # BD id 7 => 4 MB blocks


def compress_frame(data: bytes) -> bytes:
    """Compress `data` into one LZ4 frame."""
    flg = 0x60  # version 01, block-independent, no checksums
    bd = 0x70  # 4 MB max block size
    hdr = bytes([flg, bd])
    hc = (xxh32(hdr) >> 8) & 0xFF
    out = bytearray(struct.pack("<I", _MAGIC) + hdr + bytes([hc]))
    for i in range(0, len(data), BLOCK_MAX):
        block = data[i : i + BLOCK_MAX]
        comp = _compress_block(block)
        if comp and len(comp) < len(block):
            out += struct.pack("<I", len(comp)) + comp
        else:
            out += struct.pack("<I", len(block) | 0x80000000) + block
    out += struct.pack("<I", 0)  # EndMark
    return bytes(out)


def decompress_frame(data: bytes) -> bytes:
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != _MAGIC:
        raise ValueError("not an LZ4 frame")
    flg = data[4]
    if (flg >> 6) != 1:
        raise ValueError("unsupported LZ4 frame version")
    off = 6
    if flg & 0x08:  # content size present
        off += 8
    if flg & 0x01:  # dict id
        off += 4
    off += 1  # header checksum
    out = bytearray()
    while True:
        (bsize,) = struct.unpack_from("<I", data, off)
        off += 4
        if bsize == 0:
            break
        raw = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        block = data[off : off + bsize]
        off += bsize
        out += block if raw else _decompress_block(block, BLOCK_MAX)
        if flg & 0x10:  # block checksum
            off += 4
    return bytes(out)
