"""Perceptual AUDIO near-duplicate detection — a spectral band-energy
fingerprint over real decoded PCM + the engine's hash-agnostic
Hamming-banded candidate machinery (operators/imagehash.py
``dhash_bands``/``dhash_neardups`` take the hash column name, so ONE
banded near-dup engine now serves text shingles, images and audio).

The fingerprint follows the published band-energy-difference family
(Haitsma & Kalker's audio fingerprint, ISMIR 2002 — bits are SIGNS of
energy differences between adjacent frequency bands, optionally
differenced over time): we split the clip into ``N_SEGMENTS`` equal
time segments, compute each segment's magnitude spectrum (numpy rFFT),
sum it into ``N_BANDS + 1`` equal frequency bands, and emit one bit
per (segment, adjacent-band pair): ``bit = E(seg, b) > E(seg, b+1)``.
60 bits (4 segments × 15 comparisons) pack into one positive int64.

Why sign-of-difference bits: they are EXACTLY invariant to volume
(scaling every sample by c > 0 scales every band energy by c², both
sides of every comparison) and robust to mild noise/re-encoding —
while byte-identity hashing (media_dedup_sha256) misses even a gain
change. Float rFFT → no closed-form SQL oracle; parity is pinned
against an independent direct-DFT reference in pytest, the invariance
properties are tested, and the driver entry is rows-only by contract.

Scale: fingerprint is map-only Arrow decode (clips never leave their
partition; the corpus reduces to an 8-byte column); candidates ride
the shared band-bucket equi-join, never all-pairs.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .imagehash import _pack_bits

N_SEGMENTS = 4
N_BANDS = 15  # comparisons per segment (over N_BANDS + 1 band energies)
AUDIO_HASH_BITS = N_SEGMENTS * N_BANDS  # 60 — sign bit of the long stays 0


def _afp_bits(samples):
    """60 fingerprint bits from an int (or float) PCM array."""
    import numpy as np

    s = np.asarray(samples, dtype=np.float64)
    if s.size < N_SEGMENTS * 2 * (N_BANDS + 1):
        raise ValueError(
            f"audio_fingerprint: clip of {s.size} samples is too short "
            f"for {N_SEGMENTS} segments x {N_BANDS + 1} bands — pad or "
            "gate short clips upstream"
        )
    seg_len = s.size // N_SEGMENTS
    bits = []
    for q in range(N_SEGMENTS):
        seg = s[q * seg_len : (q + 1) * seg_len]
        mags = np.abs(np.fft.rfft(seg))[1:]  # drop DC — pure offset
        # equal-width bands over the magnitude spectrum; trailing
        # remainder bins fold into the last band
        edges = (np.arange(N_BANDS + 2) * len(mags)) // (N_BANDS + 1)
        E = np.add.reduceat(mags, edges[:-1])
        bits.extend(E[b] > E[b + 1] for b in range(N_BANDS))
    return bits


def audio_fingerprint(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """(id, n_samples, sample_rate, afp) per WAV payload — map-only
    Arrow batches over the shared multimodal WAV parser. Compose with
    ``imagehash.dhash_neardups(..., hash_col='afp')`` for verified
    near-dup pairs (the banding machinery is hash-agnostic)."""
    import pandas as pd

    from .multimodal import _wav_samples

    picked = df.select(
        F.col(id_col).alias("__id"),
        F.col(f"{media_col}.payload").alias("__payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, rates, hashes = [], [], [], []
            for i, raw in zip(pdf["__id"], pdf["__payload"]):
                buf = bytes(raw)
                if buf[:4] != b"RIFF":
                    raise ValueError(
                        "audio_fingerprint: unsupported payload magic "
                        f"{buf[:4]!r} — 16-bit PCM WAV decodes in pure "
                        "numpy; MP3/AAC need torchaudio/pyav wired into "
                        "this closure"
                    )
                _n_ch, rate, s = _wav_samples(buf)
                ids.append(i)
                ns.append(int(s.size))
                rates.append(rate)
                hashes.append(_pack_bits(_afp_bits(s)))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "afp": pd.Series(hashes, dtype="int64"),
                }
            )

    return picked.mapInPandas(
        run, f"{id_col} long, n_samples long, sample_rate int, afp long"
    )


def audio_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    max_distance: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """decode → fingerprint → banded candidates → exact Hamming verify
    (the shared machinery); feed ``cluster.canonical_docs_best`` for
    the keep rule. The fingerprint table is ``localCheckpoint``-ed
    (eager) — the verify plan references it four times, and the
    decode+rFFT pass must pay once (same barrier as
    ``image_neardup_pairs``)."""
    from .imagehash import dhash_neardups

    return dhash_neardups(
        audio_fingerprint(df, id_col, media_col).localCheckpoint(eager=True),
        id_col,
        hash_col="afp",
        max_distance=max_distance,
        n_bands=n_bands,
    )


# --- Deterministic near-dup audio fixture ----------------------------

AUDIO_FIXTURE = {
    "group_size": 4,  # ids i with equal i // 4 are perturbed versions
    "n_samples": 2048,
    "sample_rate": 8000,
}


def synthetic_neardup_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Real WAV fixtures: each GROUP renders a pseudo-random band
    amplitude PROFILE per time segment — the 16 band-center tones get
    amplitudes ``1 + rank``, where ranks order the 16 values of a
    64-bit multiplicative hash ``mix64(g, k, q)`` (a hash-keyed
    PERMUTATION of 1..16 per segment). Two deliberate properties:

    * **Scale-proof distinctiveness.** A first cut used
      ``(g·131 + k·101 + q·59) % 23``, which is PERIODIC in g with
      period 23 — at sf1's 12,500 groups every class of ~543 groups
      rendered identical spectra and the banded join blew up to 54.3M
      pairs (the sf1 sweep caught it; the fourth scale-exposed defect
      to date). A second cut mixed the keys AFFINELY
      (``g·A + k·B + q·C``): the g-term is the same constant for every
      band, constants mostly preserve rank order, and whole groups
      shared a permutation (measured min cross-group Hamming 0). The
      splitmix64-style finalizer fixes both: measured over ALL 13,000
      sf1 groups (84.5M pairs), min cross-group Hamming is 7, zero
      pairs ≤ 3.
    * **No tie bits.** Permutation amplitudes mean adjacent bands
      always differ by ≥1 rank (≥13.8 % energy gap at 15 vs 16), so
      the v=3 edit below can NEVER flip a comparison — with raw
      ``hash % 23`` amplitudes, equal adjacent draws (p = 1/23 each)
      sat exactly on the ``>`` boundary and the nudge flipped up to 6
      bits for some groups, breaking the ≤ ``max_distance`` recall
      contract. Bonus: the worst-case peak (Σ amps = 136 × gain 210)
      stays below int16 clip, so volume scaling is exactly linear.

    VARIANTS of a group differ by exact volume scaling, per-component
    PHASE shifts (both magnitude-spectrum-invariant; tones sit on
    exact rFFT bins — (k+0.5)·250 Hz = bin (k+0.5)·16 at 8 kHz/512 —
    so there is no leakage for phase to modulate) and, for v=3, a 3 %
    single-band gain nudge (the "small edit"; provably hash-neutral
    per the rank-gap argument, measured within-group Hamming 0).
    Rendered through the real WAV encoder so the engine path
    exercises genuine RIFF decode."""
    import numpy as np
    import pandas as pd

    from .multimodal import _wrap_media, wav_bytes

    gs = AUDIO_FIXTURE["group_size"]
    n = AUDIO_FIXTURE["n_samples"]
    rate = AUDIO_FIXTURE["sample_rate"]
    seg_n = n // N_SEGMENTS

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t = np.arange(seg_n, dtype=np.float64)
        for pdf in batches:
            payloads = []
            for i in pdf[id_col].astype("int64"):
                g, v = int(i) // gs, int(i) % gs
                segs = []
                for q in range(N_SEGMENTS):
                    hs = []
                    for k in range(N_BANDS + 1):
                        # splitmix64-style finalizer: a bare affine
                        # combine adds the SAME g-term to every k, which
                        # mostly preserves rank order across g — whole
                        # groups shared a permutation (measured min
                        # cross-group Hamming 0); the multiply-xor
                        # avalanche breaks that
                        h = (
                            g * 0x9E3779B97F4A7C15
                            ^ k * 0xC2B2AE3D27D4EB4F
                            ^ q * 0x165667B19E3779F9
                        ) % (1 << 64)
                        h = (h ^ (h >> 30)) * 0xBF58476D1CE4E5B9 % (1 << 64)
                        h = (h ^ (h >> 27)) * 0x94D049BB133111EB % (1 << 64)
                        hs.append(h ^ (h >> 31))
                    rank = {int(k): r for r, k in enumerate(np.argsort(hs))}
                    s = np.zeros(seg_n)
                    for k in range(N_BANDS + 1):
                        a = 1.0 + rank[k]
                        if v == 3 and k == (g + q) % (N_BANDS + 1):
                            a *= 1.03
                        ph = 0.3 * v * ((k + q) % 5)
                        s += a * np.sin(
                            2 * np.pi * ((k + 0.5) * 250.0) * t / rate + ph
                        )
                    segs.append(s)
                amp = 120.0 * (1.0 + 0.25 * v)
                full = np.clip(
                    amp * np.concatenate(segs), -32768, 32767
                ).astype(np.int16)
                payloads.append(wav_bytes(full, rate))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": payloads,
                    "mime": "audio/wav",
                }
            )

    raw = df.select(F.col(id_col)).mapInPandas(
        gen, "doc_id long, payload binary, mime string"
    )
    return _wrap_media(raw)
