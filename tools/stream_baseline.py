#!/usr/bin/env python3
"""Dev-only single-process twin of the streaming simhash dedup sink
(graft.streaming.Streams.simhashDedupSink), the way the reference's
pandas pipeline would run streaming ingest dedup: one Python process,
a dict-of-bands kept index, batches applied sequentially. Produces the
BASELINE-style denominator for STREAMING.md the same way
tools/baseline_pandas.py does for the batch queries.

Algorithmic twin, not bit-identical: same 60-bit token SimHash / banded
index / popcount-verify shape, Python's stable hash seeded per run is
replaced with a fixed FNV so runs are deterministic.

NOT part of the library (driver-side python stack only).

Usage: python3 tools/stream_baseline.py [universe_dir] [kept] [batch_rows] [n_batches]
"""
import sys, time
import pandas as pd

FNV_OFF, FNV_PRM, M60 = 0xcbf29ce484222325, 0x100000001b3, (1 << 60) - 1


def fnv60(s: str) -> int:
    h = FNV_OFF
    for b in s.encode():
        h = ((h ^ b) * FNV_PRM) & 0xFFFFFFFFFFFFFFFF
    return h & M60


def simhash60(text: str) -> int:
    sums = [0] * 60
    for tok in text.split():
        h = fnv60(tok)
        for i in range(60):
            sums[i] += 1 if (h >> i) & 1 else -1
    sh = 0
    for i in range(60):
        if sums[i] > 0:
            sh |= 1 << i
    return sh


def bands_of(sh: int, bands: int):
    w = 60 // bands
    return [(b, (sh >> (b * w)) & ((1 << w) - 1)) for b in range(bands)]


def main():
    universe = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf10"
    kept_n = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    batch_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    n_batches = int(sys.argv[4]) if len(sys.argv) > 4 else 6
    max_dist, bands = 3, 4

    docs = pd.read_parquet(f"{universe}/documents.parquet", columns=["doc_id", "text"])
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    kept = docs.head(kept_n)
    stream = docs.tail(24000).head(batch_rows * n_batches)

    # corpus index: band -> [(id, simhash)]
    t0 = time.perf_counter()
    index = {}
    for doc_id, text in zip(kept.doc_id, kept.text):
        sh = simhash60(text)
        for key in bands_of(sh, bands):
            index.setdefault(key, []).append((doc_id, sh))
    print(f"index build over {kept_n} kept docs: {time.perf_counter()-t0:.1f} s")

    out = []
    for b in range(n_batches):
        batch = stream.iloc[b * batch_rows:(b + 1) * batch_rows]
        t0 = time.perf_counter()
        survivors = []
        batch_sigs = []
        for doc_id, text in zip(batch.doc_id, batch.text):
            sh = simhash60(text)
            hit = False
            for key in bands_of(sh, bands):
                for (cid, csh) in index.get(key, ()):
                    if bin(sh ^ csh).count("1") <= max_dist:
                        hit = True
                        break
                if hit:
                    break
            if not hit:
                survivors.append(doc_id)
                batch_sigs.append((doc_id, sh))
        # survivors join the growing index (the sink's __sig append)
        for doc_id, sh in batch_sigs:
            for key in bands_of(sh, bands):
                index.setdefault(key, []).append((doc_id, sh))
        el = time.perf_counter() - t0
        out.append(el)
        print(f"batch {b}: {el:.2f} s  ({batch_rows/el:.0f} docs/s, "
              f"{len(survivors)}/{batch_rows} survive)")
    warm = out[1:] if len(out) > 1 else out
    mean = sum(warm) / len(warm)
    print(f'STREAM_BASELINE {{"sink":"simhash_dedup","kept":{kept_n},'
          f'"batch_rows":{batch_rows},"mean_warm_sec":{mean:.2f},'
          f'"rows_per_s":{batch_rows/mean:.0f}}}')


if __name__ == "__main__":
    main()
