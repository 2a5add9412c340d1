"""RFC 7541 HPACK conformance for the gRPC sink wire path.

Three independent evidence sources:
- the RFC 7541 Appendix C.3/C.4 request sequences (C.4.1 additionally
  cross-checked against netty's HpackDecoder while authoring),
- header blocks produced by netty 4.2's HpackEncoder (a second, real
  encoder: static-table indexing, literal-with-indexed-name over the
  DYNAMIC table, incremental indexing, integer continuation),
- a live ``curl --http2-prior-knowledge`` request decoded off the
  socket (nghttp2's encoder, Huffman-coded strings), when curl exists.

No SparkSession needed — pure codec tests.
"""

from __future__ import annotations

import shutil
import socket
import struct
import subprocess
import threading

import pytest

from etl_router_spark.sinks.hpack import (
    HpackDecoder,
    encode_literal,
    huffman_decode,
    huffman_encode,
)


def _h(s: str) -> bytes:
    return bytes.fromhex(s.replace(" ", ""))


# --- RFC 7541 Appendix C.3: request examples without Huffman ---------

def test_rfc_c3_request_sequence_dynamic_table():
    dec = HpackDecoder()
    # C.3.1
    got = dec.decode(_h("8286 8441 0f77 7777 2e65 7861 6d70 6c65 2e63 6f6d"))
    assert got == [
        (b":method", b"GET"), (b":scheme", b"http"),
        (b":path", b"/"), (b":authority", b"www.example.com"),
    ]
    assert dec._dyn_size == 57  # §C.3.1 table size after
    # C.3.2: `be` back-references the dynamic entry added in C.3.1
    got = dec.decode(_h("8286 84be 5808 6e6f 2d63 6163 6865"))
    assert got[-2:] == [
        (b":authority", b"www.example.com"), (b"cache-control", b"no-cache"),
    ]
    assert dec._dyn_size == 110
    # C.3.3
    got = dec.decode(_h(
        "8287 85bf 400a 6375 7374 6f6d 2d6b 6579 0c63 7573 746f 6d2d"
        "7661 6c75 65"))
    assert got == [
        (b":method", b"GET"), (b":scheme", b"https"),
        (b":path", b"/index.html"), (b":authority", b"www.example.com"),
        (b"custom-key", b"custom-value"),
    ]
    assert dec._dyn_size == 164


# --- RFC 7541 Appendix C.4: the same requests, Huffman-coded ---------

def test_rfc_c4_request_sequence_huffman():
    dec = HpackDecoder()
    got = dec.decode(_h("8286 8441 8cf1 e3c2 e5f2 3a6b a0ab 90f4 ff"))
    assert got == [
        (b":method", b"GET"), (b":scheme", b"http"),
        (b":path", b"/"), (b":authority", b"www.example.com"),
    ]
    got = dec.decode(_h("8286 84be 5886 a8eb 1064 9cbf"))
    assert got[-1] == (b"cache-control", b"no-cache")
    got = dec.decode(_h(
        "8287 85bf 4088 25a8 49e9 5ba9 7d7f 8925 a849 e95b b8e8 b4bf"))
    assert got[-1] == (b"custom-key", b"custom-value")


# --- netty 4.2 HpackEncoder fixtures (generated while authoring) -----
# Three successive response blocks on one connection; block 3 refers to
# dynamic entries added by blocks 1-2 via literal-with-indexed-name
# (`7f 00` = 6-bit prefix 63 + continuation byte, a dynamic-table name).

_NETTY_BLOCKS = [
    "885f106170706c69636174696f6e2f67727063",
    "88be400b677270632d7374617475730130400c677270632d6d65737361676500",
    "887f000231347f000b756e617661696c61626c65611d4d6f6e2c203231204f63"
    "7420323031332032303a31333a323220474d54400f782d637573746f6d2d6865"
    "616465723d736f6d6520666169726c79206c6f6e67206865616465722076616c"
    "756520746f207472696767657220687566666d616e20636f64696e6720706174"
    "6873",
]


def test_netty_encoder_blocks_cross_implementation():
    dec = HpackDecoder()
    b1 = dec.decode(_h(_NETTY_BLOCKS[0]))
    assert b1 == [(b":status", b"200"),
                  (b"content-type", b"application/grpc")]
    b2 = dec.decode(_h(_NETTY_BLOCKS[1]))
    assert b2 == [(b":status", b"200"),
                  (b"content-type", b"application/grpc"),
                  (b"grpc-status", b"0"), (b"grpc-message", b"")]
    b3 = dict(dec.decode(_h(_NETTY_BLOCKS[2])))
    assert b3[b"grpc-status"] == b"14"
    assert b3[b"grpc-message"] == b"unavailable"
    assert b3[b"date"] == b"Mon, 21 Oct 2013 20:13:22 GMT"
    assert b3[b"x-custom-header"].startswith(b"some fairly long")


# --- primitives ------------------------------------------------------

def test_huffman_roundtrip_all_bytes():
    data = bytes(range(256)) * 3
    assert huffman_decode(huffman_encode(data)) == data


def test_huffman_known_vector():
    # RFC 7541 §C.4.1: "www.example.com" -> f1e3 c2e5 f23a 6ba0 ab90 f4ff
    assert huffman_encode(b"www.example.com") == _h("f1e3c2e5f23a6ba0ab90f4ff")
    assert huffman_decode(_h("f1e3c2e5f23a6ba0ab90f4ff")) == b"www.example.com"


def test_huffman_bad_padding_rejected():
    # 0x00 = '0' (5 bits) + padding 000, which is not the all-ones
    # EOS prefix -> decoding error (§5.2)
    with pytest.raises(ValueError):
        huffman_decode(b"\x00")
    # 32 one-bits contain the 30-bit EOS symbol -> decoding error
    with pytest.raises(ValueError):
        huffman_decode(b"\xff\xff\xff\xff")


def test_own_literal_form_roundtrip():
    block = encode_literal(b"grpc-status", b"0") + encode_literal(
        b"grpc-message", b"")
    assert HpackDecoder().decode_dict(block) == {
        b"grpc-status": b"0", b"grpc-message": b""}


def test_dynamic_table_eviction():
    dec = HpackDecoder(max_size=64)  # fits exactly one small entry
    dec.decode(encode_literal(b"a", b"x").replace(b"\x00", b"\x40", 1))
    dec.decode(encode_literal(b"b", b"y").replace(b"\x00", b"\x40", 1))
    assert len(dec._dyn) == 1 and dec._dyn[0] == (b"b", b"y")


# --- live cross-check against curl/nghttp2 ---------------------------

@pytest.mark.skipif(shutil.which("curl") is None, reason="no curl")
def test_curl_http2_headers_decode():
    """Capture the HEADERS frame of a real ``curl
    --http2-prior-knowledge`` request and decode it: nghttp2's encoder
    uses static-table indexing, incremental indexing, and Huffman
    strings — none of which the pre-round-5 parser handled."""
    from etl_router_spark.sinks.grpc_client import (
        H2_PREFACE,
        h2_frame,
        headers_fragment,
        read_h2,
        recv_exact,
    )

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    captured: dict = {}

    def serve():
        conn, _ = srv.accept()
        try:
            assert recv_exact(conn, len(H2_PREFACE)) == H2_PREFACE
            conn.sendall(h2_frame(4, 0, 0, b""))
            dec = HpackDecoder()
            buf = b""
            while "done" not in captured:
                ftype, flags, stream, payload = read_h2(conn)
                if ftype == 4 and not flags & 1:
                    conn.sendall(h2_frame(4, 1, 0, b""))
                elif ftype == 1:
                    buf = headers_fragment(flags, payload)
                    if flags & 0x4:
                        captured["headers"] = dec.decode_dict(buf)
                        captured["done"] = True
                elif ftype == 9:
                    buf += payload
                    if flags & 0x4:
                        captured["headers"] = dec.decode_dict(buf)
                        captured["done"] = True
        except (ConnectionError, OSError, AssertionError) as exc:
            captured["err"] = repr(exc)
        finally:
            conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    # curl will time out waiting for a response; we only need its request
    subprocess.run(
        ["curl", "-s", "-m", "3", "--http2-prior-knowledge",
         "-H", "x-trace: abc123", f"http://127.0.0.1:{port}/pkg.Svc/Push"],
        capture_output=True,
    )
    t.join(timeout=5)
    srv.close()
    hdrs = captured.get("headers")
    assert hdrs, f"no HEADERS captured: {captured.get('err')}"
    assert hdrs[b":method"] == b"GET"
    assert hdrs[b":path"] == b"/pkg.Svc/Push"
    assert hdrs[b":authority"] == f"127.0.0.1:{port}".encode()
    assert hdrs[b"x-trace"] == b"abc123"
    assert b"curl" in hdrs.get(b"user-agent", b"")
