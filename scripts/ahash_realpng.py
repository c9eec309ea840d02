"""Real-decoder certification for the 256-bit wide perceptual hash.

The r12 two-decade density numbers for ``image_ahash_wide`` /
``ahash_neardup_pairs_wide`` ran on the position-ratio FAKE codec,
whose degenerate prefix skew needed ``max_bucket=256`` to stay
sub-quadratic; the claim "a real perceptual hash has near-uniform
bands" was asserted, not measured (VERDICT r12, What's missing #3).
This script measures it: a deterministic corpus of REAL PNGs (smooth
low-frequency luminance fields — the texture class that stresses aHash
hardest, because smooth rows go all-above/all-below the image mean and
pile into the 0x0000/0xFFFF band buckets) with planted near-duplicate
groups (re-encode, brightness shift, nearest-resize, sparse noise),
hashed through the stdlib PNG decode path (``decode_fn="real"``,
pipeline/multimodal.py), banded sixteen 16-bit bands / d<=15 — the r12
pigeonhole configuration.

Measured per density (default 2k and 20k images):
  - band-bucket occupancy: max / p99.9 bucket size per band, and the
    share of band keys that are the degenerate all-0/all-1 rows
  - candidate pairs, no-cap vs capped (the stop-band discipline)
  - planted-pair recall in each config (truth = planted-group pairs
    whose actual hash Hamming <= max_hamming, computed in numpy)

Usage: python scripts/ahash_realpng.py [out.json] [--n 2000,20000]
Reference anchor: the banded near-dup contract in SURVEY.md §2.4
(mm_ahash_wide_neardup row); results recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import struct
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, "/root/repo")

GRID = 16
BITS = 256
BANDS = 16
MAX_HAMMING = 15
CAP = 64  # headline stop-band cap under test for the capped config
CAPS = (64, 16, 8)  # occupancy caps swept per density
SIZE = 64  # base image edge, px


def encode_png_gray(px: np.ndarray) -> bytes:
    """Minimal filter-0 grayscale PNG encoder (stdlib only)."""
    h, w = px.shape

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += px[y].astype(np.uint8).tobytes()
    ihdr = struct.pack(">II5B", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def smooth_field(rng: np.random.RandomState, size: int = SIZE) -> np.ndarray:
    """A smooth random luminance field: sum of a few random 2D cosines
    plus a random linear gradient — the hardest honest proxy for photo
    content without a codec library (smooth regions, global gradients,
    rows that sit entirely above/below the image mean)."""
    y, x = np.mgrid[0:size, 0:size].astype(np.float64) / size
    img = rng.uniform(-1, 1) * x + rng.uniform(-1, 1) * y
    for _ in range(rng.randint(2, 5)):
        fx, fy = rng.uniform(0.5, 3.0, 2)
        px_, py_ = rng.uniform(0, 2 * np.pi, 2)
        img += rng.uniform(0.3, 1.0) * np.cos(
            2 * np.pi * (fx * x + px_) + 0.0
        ) * np.cos(2 * np.pi * (fy * y + py_))
    img += rng.normal(0, 0.05, (size, size))
    lo, hi = img.min(), img.max()
    return ((img - lo) / max(hi - lo, 1e-9) * 255).astype(np.uint8)


def nearest_resize(px: np.ndarray, new: int) -> np.ndarray:
    h, w = px.shape
    yi = (np.arange(new) * h) // new
    xi = (np.arange(new) * w) // new
    return px[np.ix_(yi, xi)]


def build_corpus(n: int, seed: int = 13):
    """n total images: ~70% unique bases, the rest planted variants in
    groups of 4 (base + re-encode + brightness + resize|noise).
    Returns (rows, groups) with rows = [(media_id, png_bytes)]."""
    rng = np.random.RandomState(seed)
    rows, groups = [], []
    mid = 0
    n_groups = n // 10  # 10% of images are group bases -> 40% in groups
    while mid < n:
        base = smooth_field(rng)
        if len(groups) < n_groups and mid + 4 <= n:
            g = [mid]
            rows.append((mid, encode_png_gray(base)))
            mid += 1
            # re-encode: identical pixels, different compression level
            g.append(mid)
            rec = encode_png_gray(base)  # deterministic; d == 0 by pixels
            rows.append((mid, rec))
            mid += 1
            # brightness shift: +6 shifts mean with the cells -> tiny d
            g.append(mid)
            rows.append(
                (mid, encode_png_gray(np.clip(base.astype(np.int32) + 6, 0, 255)))
            )
            mid += 1
            # alternate: nearest-resize or sparse noise
            g.append(mid)
            if rng.rand() < 0.5:
                rows.append((mid, encode_png_gray(nearest_resize(base, 48))))
            else:
                noisy = base.copy()
                ii = rng.randint(0, SIZE, 40)
                jj = rng.randint(0, SIZE, 40)
                noisy[ii, jj] = rng.randint(0, 256, 40)
                rows.append((mid, encode_png_gray(noisy)))
            mid += 1
            groups.append(g)
        else:
            rows.append((mid, encode_png_gray(base)))
            mid += 1
    return rows, groups


def hamming_words(a, b) -> int:
    return sum(bin((x ^ y) & ((1 << 64) - 1)).count("1") for x, y in zip(a, b))


def run_density(spark, n: int) -> dict:
    from pyspark.sql import functions as F

    from time_series_db_spark.pipeline import multimodal

    rows, groups = build_corpus(n)
    t0 = time.time()
    media = spark.createDataFrame(
        rows, "media_id long, content binary"
    ).repartition(32)
    hashes = multimodal.image_ahash_wide(
        media, decode_fn="real", grid=GRID
    ).persist()
    hcount = hashes.count()
    t_hash = time.time() - t0
    hmap = {r["media_id"]: r["ahash_words"] for r in hashes.collect()}
    assert len(hmap) == n and all(v is not None for v in hmap.values())

    # planted truth: group pairs whose ACTUAL hash hamming <= radius
    true_pairs = set()
    planted_d = []
    for g in groups:
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                d = hamming_words(hmap[g[i]], hmap[g[j]])
                planted_d.append(d)
                if d <= MAX_HAMMING:
                    true_pairs.add((min(g[i], g[j]), max(g[i], g[j])))

    # band occupancy from the hashes (numpy replay of _band_key)
    width = BITS // BANDS
    occ = {}
    degen = 0
    keys_total = 0
    from collections import Counter

    for b in range(BANDS):
        word, shift = (b * width) // 64, (b * width) % 64
        cnt = Counter(
            ((h[word] >> shift) & ((1 << width) - 1)) for h in hmap.values()
        )
        sizes = sorted(cnt.values(), reverse=True)
        keys_total += len(cnt)
        degen += cnt.get(0, 0) + cnt.get((1 << width) - 1, 0)
        occ[b] = {
            "distinct_keys": len(cnt),
            "max_bucket": sizes[0],
            "p999_bucket": sizes[max(0, int(len(sizes) * 0.001) - 1)],
            "top3": sizes[:3],
        }
    max_bucket_overall = max(o["max_bucket"] for o in occ.values())

    out = {
        "n_images": n,
        "n_groups": len(groups),
        "true_pairs": len(true_pairs),
        "planted_hamming_max": max(planted_d),
        "planted_hamming_mean": float(np.mean(planted_d)),
        "hash_secs": round(t_hash, 2),
        "degenerate_key_share": round(degen / (BANDS * n), 4),
        "max_bucket_overall": max_bucket_overall,
        "band_occupancy": {str(b): occ[b] for b in (0, 7, 15)},
    }
    for label, cap in (
        ("nocap", None),
        *((f"cap{c}", c) for c in CAPS),
    ):
        t0 = time.time()
        cand = multimodal.ahash_neardup_pairs_wide(
            hashes,
            max_hamming=MAX_HAMMING,
            num_bands=BANDS,
            bits=BITS,
            max_bucket=cap,
            candidates_only=True,
        )
        n_cand = cand.count()
        t_cand = time.time() - t0
        got = {
            (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
            for r in multimodal.ahash_neardup_pairs_wide(
                hashes,
                max_hamming=MAX_HAMMING,
                num_bands=BANDS,
                bits=BITS,
                max_bucket=cap,
            ).collect()
        }
        found = len(true_pairs & got)
        out[label] = {
            "candidates": n_cand,
            "cand_secs": round(t_cand, 2),
            "verified_pairs": len(got),
            "planted_recall": round(found / max(len(true_pairs), 1), 4),
            "cand_per_image": round(n_cand / n, 2),
        }
    hashes.unpersist()
    return out


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "scripts/ahash_realpng_r13.json"
    ns = [2000, 20000]
    for a in sys.argv[2:]:
        if a.startswith("--n"):
            ns = [int(x) for x in a.split("=", 1)[1].split(",")]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results = {"config": {
        "grid": GRID, "bits": BITS, "bands": BANDS,
        "max_hamming": MAX_HAMMING, "cap": CAP, "image_px": SIZE,
    }, "densities": []}
    for n in ns:
        r = run_density(spark, n)
        print(json.dumps(r))
        results["densities"].append(r)
    if len(results["densities"]) == 2:
        a, b = results["densities"]
        ratio = b["n_images"] / a["n_images"]
        for label in ("nocap", *(f"cap{c}" for c in CAPS)):
            ca, cb = a[label]["candidates"], b[label]["candidates"]
            results[f"exponent_{label}"] = round(
                float(np.log(max(cb, 1) / max(ca, 1)) / np.log(ratio)), 3
            )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
