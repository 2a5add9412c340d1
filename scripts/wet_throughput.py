"""Measure single-core WARC/WET parse throughput (MB/s, records/s).

The warc source parallelizes one task per archive file, so per-core
parse speed is the ONLY scaling variable: cluster wall time for a
crawl is ``archive_bytes / (cores * MB_per_s)``. This script builds a
synthetic WET of realistic record size (~4 KiB text payloads), parses
it single-threaded through the production ``parse_warc_stream``, and
prints one JSON line per layout (plain, member-gzip).

Usage: python scripts/wet_throughput.py [target_mb]
"""

from __future__ import annotations

import gzip
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_router_spark.sources.warc import parse_warc_stream, write_wet  # noqa: E402


def build_fixture(path: str, target_mb: int, gz: bool) -> int:
    words = ("the quick brown fox jumps over a lazy dog and all the usual "
             "english filler text that a web page body would carry ")
    payload = (words * 60)[:4096]  # ~4 KiB, the WET sweet spot

    def recs():
        i = 0
        # uncompressed record ~4.3 KiB; count to hit target_mb raw
        n = (target_mb * 1024 * 1024) // 4400
        while i < n:
            yield {"url": f"http://t.example/{i}", "payload": f"{i} {payload}"}
            i += 1

    return write_wet(path, recs(), gzip_members=gz)


def timed_parse(path: str, gz: bool) -> dict:
    opener = gzip.open if gz else open
    t0 = time.perf_counter()
    n = 0
    with opener(path, "rb") as fh:
        for _ in parse_warc_stream(fh):
            n += 1
    wall = time.perf_counter() - t0
    raw_mb = n * 4400 / 1024 / 1024  # uncompressed bytes parsed
    return {
        "layout": "member-gzip" if gz else "plain",
        "records": n,
        "file_mb": round(os.path.getsize(path) / 1024 / 1024, 1),
        "raw_mb": round(raw_mb, 1),
        "wall_s": round(wall, 2),
        "raw_mb_per_s_per_core": round(raw_mb / wall, 1),
        "records_per_s_per_core": int(n / wall),
    }


def main() -> None:
    target_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    for gz in (False, True):
        suffix = ".warc.wet.gz" if gz else ".warc.wet"
        fd, path = tempfile.mkstemp(suffix=suffix)
        os.close(fd)
        try:
            build_fixture(path, target_mb, gz)
            print(json.dumps(timed_parse(path, gz)))
        finally:
            os.unlink(path)


if __name__ == "__main__":
    main()
