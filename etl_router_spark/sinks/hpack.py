"""RFC 7541 HPACK codec — the header-compression half of the gRPC
sink/source wire path (``sinks/grpc_client.py``).

A real gRPC server does not restrict itself to literal-without-indexing
headers: nghttp2/grpc-go emit static-table indexed fields (``0x88`` for
``:status: 200``), literal-with-incremental-indexing over the static
table, dynamic-table back-references on later responses of the same
connection, and Huffman-coded strings.  This module implements the full
public spec so the sink interoperates beyond the bundled hermetic
receiver:

- integer primitives with N-bit prefix + continuation (§5.1),
- Huffman string coding with the Appendix B code table (§5.2),
- the 61-entry static table (Appendix A),
- a per-connection decoder with the dynamic table, eviction, and all
  four representation forms (§6.1-6.3),
- a literal-without-indexing encoder (what our client/receiver emit —
  always legal, zero connection state).

Conformance is pinned by ``tests/test_hpack.py``: the RFC 7541
Appendix C request/response sequences (C.3-C.6, including the
Huffman-coded and dynamic-table-evicting ones) decode exactly, and a
cross-implementation test decodes a header block produced by the
system ``curl --http2-prior-knowledge`` (nghttp2's encoder).

Everything here is public protocol; the code tables are the RFC 7541
Appendix A/B data.
"""

from __future__ import annotations

# Appendix B Huffman code table: 257 ``code:length`` hex pairs for
# symbols 0..255 + EOS(256), in symbol order.
_HUFF_COMPACT = (
    "1ff8:d,7fffd8:17,fffffe2:1c,fffffe3:1c,fffffe4:1c,fffffe5:1c,"
    "fffffe6:1c,fffffe7:1c,fffffe8:1c,ffffea:18,3ffffffc:1e,fffffe9:1c,"
    "fffffea:1c,3ffffffd:1e,fffffeb:1c,fffffec:1c,fffffed:1c,fffffee:1c,"
    "fffffef:1c,ffffff0:1c,ffffff1:1c,ffffff2:1c,3ffffffe:1e,ffffff3:1c,"
    "ffffff4:1c,ffffff5:1c,ffffff6:1c,ffffff7:1c,ffffff8:1c,ffffff9:1c,"
    "ffffffa:1c,ffffffb:1c,14:6,3f8:a,3f9:a,ffa:c,1ff9:d,15:6,f8:8,"
    "7fa:b,3fa:a,3fb:a,f9:8,7fb:b,fa:8,16:6,17:6,18:6,0:5,1:5,2:5,19:6,"
    "1a:6,1b:6,1c:6,1d:6,1e:6,1f:6,5c:7,fb:8,7ffc:f,20:6,ffb:c,3fc:a,"
    "1ffa:d,21:6,5d:7,5e:7,5f:7,60:7,61:7,62:7,63:7,64:7,65:7,66:7,"
    "67:7,68:7,69:7,6a:7,6b:7,6c:7,6d:7,6e:7,6f:7,70:7,71:7,72:7,fc:8,"
    "73:7,fd:8,1ffb:d,7fff0:13,1ffc:d,3ffc:e,22:6,7ffd:f,3:5,23:6,4:5,"
    "24:6,5:5,25:6,26:6,27:6,6:5,74:7,75:7,28:6,29:6,2a:6,7:5,2b:6,"
    "76:7,2c:6,8:5,9:5,2d:6,77:7,78:7,79:7,7a:7,7b:7,7ffe:f,7fc:b,"
    "3ffd:e,1ffd:d,ffffffc:1c,fffe6:14,3fffd2:16,fffe7:14,fffe8:14,"
    "3fffd3:16,3fffd4:16,3fffd5:16,7fffd9:17,3fffd6:16,7fffda:17,"
    "7fffdb:17,7fffdc:17,7fffdd:17,7fffde:17,ffffeb:18,7fffdf:17,"
    "ffffec:18,ffffed:18,3fffd7:16,7fffe0:17,ffffee:18,7fffe1:17,"
    "7fffe2:17,7fffe3:17,7fffe4:17,1fffdc:15,3fffd8:16,7fffe5:17,"
    "3fffd9:16,7fffe6:17,7fffe7:17,ffffef:18,3fffda:16,1fffdd:15,"
    "fffe9:14,3fffdb:16,3fffdc:16,7fffe8:17,7fffe9:17,1fffde:15,"
    "7fffea:17,3fffdd:16,3fffde:16,fffff0:18,1fffdf:15,3fffdf:16,"
    "7fffeb:17,7fffec:17,1fffe0:15,1fffe1:15,3fffe0:16,1fffe2:15,"
    "7fffed:17,3fffe1:16,7fffee:17,7fffef:17,fffea:14,3fffe2:16,"
    "3fffe3:16,3fffe4:16,7ffff0:17,3fffe5:16,3fffe6:16,7ffff1:17,"
    "3ffffe0:1a,3ffffe1:1a,fffeb:14,7fff1:13,3fffe7:16,7ffff2:17,"
    "3fffe8:16,1ffffec:19,3ffffe2:1a,3ffffe3:1a,3ffffe4:1a,7ffffde:1b,"
    "7ffffdf:1b,3ffffe5:1a,fffff1:18,1ffffed:19,7fff2:13,1fffe3:15,"
    "3ffffe6:1a,7ffffe0:1b,7ffffe1:1b,3ffffe7:1a,7ffffe2:1b,fffff2:18,"
    "1fffe4:15,1fffe5:15,3ffffe8:1a,3ffffe9:1a,ffffffd:1c,7ffffe3:1b,"
    "7ffffe4:1b,7ffffe5:1b,fffec:14,fffff3:18,fffed:14,1fffe6:15,"
    "3fffe9:16,1fffe7:15,1fffe8:15,7ffff3:17,3fffea:16,3fffeb:16,"
    "1ffffee:19,1ffffef:19,fffff4:18,fffff5:18,3ffffea:1a,7ffff4:17,"
    "3ffffeb:1a,7ffffe6:1b,3ffffec:1a,3ffffed:1a,7ffffe7:1b,7ffffe8:1b,"
    "7ffffe9:1b,7ffffea:1b,7ffffeb:1b,ffffffe:1c,7ffffec:1b,7ffffed:1b,"
    "7ffffee:1b,7ffffef:1b,7fffff0:1b,3ffffee:1a,3fffffff:1e"
)

HUFFMAN_CODES: list[tuple[int, int]] = [
    (int(c, 16), int(n, 16))
    for c, n in (pair.split(":") for pair in _HUFF_COMPACT.split(","))
]
assert len(HUFFMAN_CODES) == 257

# (code, nbits) -> symbol; the code is prefix-free so (acc, nbits)
# membership is an unambiguous decode step
_DECODE: dict[tuple[int, int], int] = {
    (code, nbits): sym for sym, (code, nbits) in enumerate(HUFFMAN_CODES)
}
_EOS = 256


def huffman_decode(data: bytes) -> bytes:
    out = bytearray()
    acc = nbits = 0
    for byte in data:
        for shift in range(7, -1, -1):
            acc = (acc << 1) | ((byte >> shift) & 1)
            nbits += 1
            sym = _DECODE.get((acc, nbits))
            if sym is not None:
                if sym == _EOS:
                    raise ValueError("EOS symbol inside Huffman string")
                out.append(sym)
                acc = nbits = 0
    # §5.2: padding must be the most-significant bits of EOS (all ones)
    # and strictly shorter than 8 bits
    if nbits >= 8 or acc != (1 << nbits) - 1:
        raise ValueError("invalid Huffman padding")
    return bytes(out)


def huffman_encode(data: bytes) -> bytes:
    acc = nbits = 0
    out = bytearray()
    for byte in data:
        code, n = HUFFMAN_CODES[byte]
        acc = (acc << n) | code
        nbits += n
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        out.append(((acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)) & 0xFF)
    return bytes(out)


# Appendix A static table, indices 1..61.
STATIC_TABLE: tuple[tuple[bytes, bytes], ...] = tuple(
    (n.encode(), v.encode())
    for n, v in [
        (":authority", ""), (":method", "GET"), (":method", "POST"),
        (":path", "/"), (":path", "/index.html"), (":scheme", "http"),
        (":scheme", "https"), (":status", "200"), (":status", "204"),
        (":status", "206"), (":status", "304"), (":status", "400"),
        (":status", "404"), (":status", "500"), ("accept-charset", ""),
        ("accept-encoding", "gzip, deflate"), ("accept-language", ""),
        ("accept-ranges", ""), ("accept", ""),
        ("access-control-allow-origin", ""), ("age", ""), ("allow", ""),
        ("authorization", ""), ("cache-control", ""),
        ("content-disposition", ""), ("content-encoding", ""),
        ("content-language", ""), ("content-length", ""),
        ("content-location", ""), ("content-range", ""),
        ("content-type", ""), ("cookie", ""), ("date", ""), ("etag", ""),
        ("expect", ""), ("expires", ""), ("from", ""), ("host", ""),
        ("if-match", ""), ("if-modified-since", ""),
        ("if-none-match", ""), ("if-range", ""),
        ("if-unmodified-since", ""), ("last-modified", ""), ("link", ""),
        ("location", ""), ("max-forwards", ""),
        ("proxy-authenticate", ""), ("proxy-authorization", ""),
        ("range", ""), ("referer", ""), ("refresh", ""),
        ("retry-after", ""), ("server", ""), ("set-cookie", ""),
        ("strict-transport-security", ""), ("transfer-encoding", ""),
        ("user-agent", ""), ("vary", ""), ("via", ""),
        ("www-authenticate", ""),
    ]
)
assert len(STATIC_TABLE) == 61


def decode_int(block: bytes, i: int, prefix_bits: int) -> tuple[int, int]:
    """§5.1 integer with N-bit prefix; returns (value, next_index)."""
    mask = (1 << prefix_bits) - 1
    value = block[i] & mask
    i += 1
    if value < mask:
        return value, i
    shift = 0
    while True:
        if shift > 63:  # bound like a 64-bit varint; RFC 7541 §5.1 allows
            # arbitrarily large integers but no sane peer sends one
            raise ValueError("HPACK integer exceeds 64 bits (malformed input)")
        b = block[i]
        i += 1
        value += (b & 0x7F) << shift
        if not b & 0x80:
            return value, i
        shift += 7


def encode_int(value: int, prefix_bits: int, first_byte: int = 0) -> bytes:
    """§5.1 encode; ``first_byte`` carries the representation flag bits."""
    mask = (1 << prefix_bits) - 1
    if value < mask:
        return bytes([first_byte | value])
    out = bytearray([first_byte | mask])
    value -= mask
    while value >= 0x80:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    out.append(value)
    return bytes(out)


def _decode_string(block: bytes, i: int) -> tuple[bytes, int]:
    huff = bool(block[i] & 0x80)
    length, i = decode_int(block, i, 7)
    raw = block[i:i + length]
    if len(raw) != length:
        raise ValueError("truncated HPACK string")
    return (huffman_decode(raw) if huff else raw), i + length


def encode_literal(name: bytes, value: bytes) -> bytes:
    """§6.2.2 literal without indexing, new name, no Huffman — the
    stateless form our client and hermetic receiver emit."""
    return (b"\x00" + encode_int(len(name), 7) + name
            + encode_int(len(value), 7) + value)


class HpackDecoder:
    """Per-connection decoder: HPACK dynamic-table state is scoped to
    the HTTP/2 connection (§2.2), so hold one instance per socket and
    feed it every header block in arrival order."""

    def __init__(self, max_size: int = 4096):
        self.max_size = max_size
        self._dyn: list[tuple[bytes, bytes]] = []  # most recent first
        self._dyn_size = 0

    def _entry(self, idx: int) -> tuple[bytes, bytes]:
        if idx <= 0:
            raise ValueError("HPACK index 0 is invalid")
        if idx <= len(STATIC_TABLE):
            return STATIC_TABLE[idx - 1]
        d = idx - len(STATIC_TABLE) - 1
        if d >= len(self._dyn):
            raise ValueError(f"HPACK index {idx} beyond table")
        return self._dyn[d]

    def _add(self, name: bytes, value: bytes) -> None:
        self._dyn.insert(0, (name, value))
        self._dyn_size += len(name) + len(value) + 32  # §4.1 entry size
        self._evict()

    def _evict(self) -> None:
        while self._dyn_size > self.max_size and self._dyn:
            n, v = self._dyn.pop()
            self._dyn_size -= len(n) + len(v) + 32

    def decode(self, block: bytes) -> list[tuple[bytes, bytes]]:
        out: list[tuple[bytes, bytes]] = []
        i = 0
        while i < len(block):
            b = block[i]
            if b & 0x80:  # §6.1 indexed field
                idx, i = decode_int(block, i, 7)
                out.append(self._entry(idx))
            elif b & 0x40:  # §6.2.1 literal, incremental indexing
                idx, i = decode_int(block, i, 6)
                name = self._entry(idx)[0] if idx else None
                if name is None:
                    name, i = _decode_string(block, i)
                value, i = _decode_string(block, i)
                self._add(name, value)
                out.append((name, value))
            elif b & 0x20:  # §6.3 dynamic table size update
                size, i = decode_int(block, i, 5)
                self.max_size = size
                self._evict()
            else:  # §6.2.2 / §6.2.3 literal without / never indexed
                idx, i = decode_int(block, i, 4)
                name = self._entry(idx)[0] if idx else None
                if name is None:
                    name, i = _decode_string(block, i)
                value, i = _decode_string(block, i)
                out.append((name, value))
        return out

    def decode_dict(self, block: bytes) -> dict[bytes, bytes]:
        return dict(self.decode(block))
