"""Audio fingerprinting + audio near-duplicate pairs over binary WAV
payloads -- the audio leg of multimodal dedup (re-encoded clips, the same
recording with trimmed silence or one glitched window land within a few
bits of each other).

Fingerprint family (the energy-profile shape classic audio fingerprints
reduce to -- Haitsma-Kalker-style band-energy comparisons, collapsed to
the time axis since this container has no FFT dependency):

* **eHash (energy hash)**: split the sample stream into 64 equal time
  windows; bit j = 1 where window j's mean energy (|sample - 128|, the
  8-bit PCM midpoint) exceeds the GLOBAL mean energy.
* **gHash (gradient hash)**: bit j = 1 where window j's mean energy
  exceeds the next window's (wrapping) -- the temporal twin of the image
  tier's gradient hash.

Everything is INTEGER-EXACT (window membership is the floor mapping
``j = t*64 // n``; every mean comparison is cross-multiplied) so an
external SQL engine reproduces each bit from the generative sample
formula -- the same oracle discipline as ``ops.images``, whose
``_pack``/near-dup machinery this module reuses:
:func:`nreadspark.ops.images.near_dup_image_pairs` consumes the
fingerprint table directly (``which='ehash'``) because any 64-bit hash
packed as two int32-range halves speaks the same banded-hamming
protocol.

Scale shape: fingerprinting is ONE ``mapInPandas`` crossing (payload in,
16 bytes of hash out, zero shuffles); pair generation is the shared
banded self-join (exact for hamming < n_bands by pigeonhole).

The PCM parser is pure stdlib, per-payload error containment throughout;
non-PCM8 payloads take tags, never task failures.  Reference parity:
NReadability has no audio pipeline -- beyond-reference multimodal
surface, sibling to ``ops/images.py``.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .images import GRID, _pack

N_WINDOWS = GRID * GRID  # 64 windows -> 64-bit hashes, shared band math

AFP_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("n_samples", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("ehash_hi", LongType()),
        StructField("ehash_lo", LongType()),
        StructField("ghash_hi", LongType()),
        StructField("ghash_lo", LongType()),
        StructField("decoder", StringType()),
    ]
)


def wav_pcm8_samples(raw: bytes):
    """(sample_rate, samples: bytes) from a RIFF/WAVE payload holding
    8-bit mono PCM.  Word-aligned chunk walk (same conventions as
    ``ops.multimodal.parse_wav_header``); ``ValueError`` for anything
    that is not complete PCM8 mono -- the caller's containment tier."""
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(raw):
        ctype = raw[i : i + 4]
        clen = int.from_bytes(raw[i + 4 : i + 8], "little")
        body = raw[i + 8 : i + 8 + clen]
        if len(body) < clen:
            raise ValueError("truncated chunk")
        if ctype == b"fmt ":
            fmt = body
        elif ctype == b"data":
            data = body
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("short fmt chunk")
    audio_fmt, channels, rate = struct.unpack("<HHI", fmt[:8])
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_fmt != 1 or channels != 1 or bits != 8:
        raise ValueError(f"unsupported WAV (fmt={audio_fmt}, ch={channels}, bits={bits})")
    return rate, data


def _window_sums(samples) -> tuple[list[int], list[int]]:
    """(sums, counts) of per-sample energy |s - 128| over the N_WINDOWS
    floor-mapped time windows -- the 1-D twin of the image block sums."""
    n = len(samples)
    sums = [0] * N_WINDOWS
    counts = [0] * N_WINDOWS
    for t, s in enumerate(samples):
        j = t * N_WINDOWS // n
        sums[j] += s - 128 if s >= 128 else 128 - s
        counts[j] += 1
    return sums, counts


def ehash64(samples) -> tuple[int, int]:
    """Energy hash: bit j = window-j mean energy > global mean energy,
    cross-multiplied (``S_j * n > T * C_j``) -- integer-exact."""
    sums, counts = _window_sums(samples)
    total, n = sum(sums), len(samples)
    bits = [1 if sums[j] * n > total * counts[j] else 0 for j in range(N_WINDOWS)]
    return _pack(bits)


def ghash64(samples) -> tuple[int, int]:
    """Gradient hash: bit j = window-j mean energy > next window's
    (wrapping), cross-multiplied."""
    sums, counts = _window_sums(samples)
    bits = []
    for j in range(N_WINDOWS):
        nj = (j + 1) % N_WINDOWS
        bits.append(1 if sums[j] * counts[nj] > sums[nj] * counts[j] else 0)
    return _pack(bits)


def audio_fingerprints(
    media_df: DataFrame,
    ref_col: str = "media_ref",
    payload_col: str = "payload",
    max_decode_samples: int | None = 1 << 20,
) -> DataFrame:
    """(media_ref, n_samples, sample_rate, ehash_hi/lo, ghash_hi/lo,
    decoder): fingerprints per WAV payload, ONE Arrow crossing, zero
    shuffles.  Tags: ``pcm8`` on success, ``too-short`` under 64
    samples, ``capped`` past ``max_decode_samples`` (~1M samples = 17
    minutes of phone-quality mono; production swaps in a native
    decoder), ``undecodable`` otherwise -- NULL hashes, never failures."""

    def batches(iterator):
        import pandas as pd

        for pdf in iterator:
            out = {
                "media_ref": pdf[ref_col],
                "n_samples": [],
                "sample_rate": [],
                "ehash_hi": [],
                "ehash_lo": [],
                "ghash_hi": [],
                "ghash_lo": [],
                "decoder": [],
            }
            for p in pdf[payload_col].tolist():
                raw = bytes(p) if p is not None else b""
                n = rate = None
                hashes = None
                decoder = "undecodable"
                try:
                    rate, data = wav_pcm8_samples(raw)
                    n = len(data)
                    if n < N_WINDOWS:
                        decoder = "too-short"
                    elif max_decode_samples is not None and n > max_decode_samples:
                        decoder = "capped"
                    else:
                        hashes = ehash64(data) + ghash64(data)
                        decoder = "pcm8"
                except ValueError:
                    n = rate = None
                out["n_samples"].append(n)
                out["sample_rate"].append(rate)
                out["ehash_hi"].append(hashes[0] if hashes else None)
                out["ehash_lo"].append(hashes[1] if hashes else None)
                out["ghash_hi"].append(hashes[2] if hashes else None)
                out["ghash_lo"].append(hashes[3] if hashes else None)
                out["decoder"].append(decoder)
            yield pd.DataFrame(out)

    return media_df.select(ref_col, payload_col).mapInPandas(batches, AFP_SCHEMA)


# ---------------------------------------------------------------------------
# deterministic synthetic WAV corpus (tests + oracles)


def encode_pcm8_wav(samples: bytes, rate: int = 1000) -> bytes:
    """Minimal VALID RIFF/WAVE encoder: PCM 8-bit mono."""
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate, 1, 8)
    data_len = len(samples)
    riff_len = 4 + (8 + len(fmt)) + (8 + data_len)
    return (
        b"RIFF"
        + struct.pack("<I", riff_len)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", data_len)
        + samples
    )


def synth_sample(base: int, t: int) -> int:
    """The closed-form sample function shared with the SQL oracle."""
    return (37 * base + 13 * t + (t * t) % 251) % 256


def synthesize_wav_corpus(
    docs_df: DataFrame,
    n_samples: int = 2048,
    n_bases: int = 97,
    corrupt_mod: int = 101,
) -> DataFrame:
    """(doc_id, media_ref, payload): deterministic PCM8 WAVs,
    ``sample(t) = (37*(doc_id % n_bases) + 13t + t² mod 251) mod 256`` --
    closed form in doc_id so a SQL oracle recomputes the exact
    fingerprints without parsing WAV bytes.  ``doc_id % n_bases``
    collisions plant exact-duplicate clusters; ``doc_id % corrupt_mod ==
    7`` rows are truncated to exercise containment."""

    def batches(iterator):
        import pandas as pd

        for pdf in iterator:
            refs, payloads = [], []
            for doc_id in pdf["doc_id"].tolist():
                base = int(doc_id) % n_bases
                samples = bytes(synth_sample(base, t) for t in range(n_samples))
                raw = encode_pcm8_wav(samples)
                if int(doc_id) % corrupt_mod == 7:
                    raw = raw[:10]
                refs.append(f"aud://{doc_id}")
                payloads.append(raw)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_ref": refs, "payload": payloads}
            )

    from pyspark.sql.types import BinaryType

    schema = StructType(
        [
            docs_df.schema["doc_id"],
            StructField("media_ref", StringType()),
            StructField("payload", BinaryType()),
        ]
    )
    return docs_df.select("doc_id").mapInPandas(batches, schema)
