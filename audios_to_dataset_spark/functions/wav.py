"""WAV header decoding (P4) as an Arrow-batched pandas UDF.

Reference semantics (/root/reference/src/main.rs:760-769, via the hound
crate): parse the in-memory WAV; ``duration = samples_per_channel /
sample_rate`` (f64 seconds), ``sampling_rate`` i32; ANY parse failure →
``(0.0, 0)`` so non-WAV files are kept with zero duration (README.md:94).

This is one of the two genuinely non-relational computations in the
engine (the other is MIME sniffing, which magic-bytes expressions cover),
so it is the one place a pandas UDF is justified: pure-Python RIFF chunk
walk over Arrow-delivered bytes, no JVM audio codec needed.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

WAV_RESULT_TYPE = T.StructType(
    [
        T.StructField("duration", T.DoubleType(), False),
        T.StructField("sampling_rate", T.IntegerType(), False),
    ]
)


def parse_wav_header(data: bytes | None) -> tuple[float, int]:
    """Parse RIFF/WAVE: find fmt (sample rate, block align) and data
    (payload size); duration = data_size / block_align / sample_rate.
    Any structural problem → (0.0, 0)."""
    try:
        if data is None or len(data) < 12:
            return 0.0, 0
        if data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
            return 0.0, 0
        pos = 12
        sample_rate = 0
        block_align = 0
        data_size = -1
        n = len(data)
        while pos + 8 <= n:
            chunk_id = data[pos : pos + 4]
            (chunk_size,) = struct.unpack_from("<I", data, pos + 4)
            body = pos + 8
            if chunk_id == b"fmt " and body + 16 <= n:
                (_fmt_tag, _channels, sample_rate, _byte_rate, block_align,
                 _bits) = struct.unpack_from("<HHIIHH", data, body)
            elif chunk_id == b"data":
                data_size = min(chunk_size, n - body)
            # chunks are word-aligned: odd sizes are padded by one byte
            pos = body + chunk_size + (chunk_size & 1)
        if sample_rate <= 0 or block_align <= 0 or data_size < 0:
            return 0.0, 0
        samples_per_channel = data_size // block_align
        return samples_per_channel / sample_rate, int(sample_rate)
    except Exception:
        return 0.0, 0


@pandas_udf(WAV_RESULT_TYPE)
def wav_info(content: pd.Series) -> pd.DataFrame:
    out = [parse_wav_header(b) for b in content]
    return pd.DataFrame(
        {
            "duration": [d for d, _ in out],
            "sampling_rate": [s for _, s in out],
        }
    )


def with_wav_info(col: Column) -> Column:
    """Struct column ``(duration double, sampling_rate int)`` decoded from
    WAV bytes."""
    return wav_info(col)


def synth_wav(
    sample_rate: int = 16_000,
    n_samples: int | None = None,
    freq_hz: float = 440.0,
    channels: int = 1,
) -> bytes:
    """Deterministic 16-bit PCM sine-wave WAV for tests — the fixture shape
    the reference's e2e tests generate (tests/end_to_end.rs:332-351):
    exactly ``sample_rate`` samples by default → duration exactly 1.0 s."""
    import math

    if n_samples is None:
        n_samples = sample_rate
    body = bytearray()
    for i in range(n_samples):
        v = int(32767.0 * math.sin(2.0 * math.pi * freq_hz * i / sample_rate))
        frame = struct.pack("<h", v) * channels
        body += frame
    block_align = 2 * channels
    byte_rate = sample_rate * block_align
    data_size = len(body)
    hdr = b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, block_align, 16
    )
    data = b"data" + struct.pack("<I", data_size)
    return bytes(hdr + fmt + data + body)
