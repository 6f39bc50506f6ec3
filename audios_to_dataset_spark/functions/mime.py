"""MIME sniffing for the audio allow-list filter (S4).

The reference uses libmagic-style content detection and keeps 12 audio
MIME types (/root/reference/src/main.rs:97-110, 695-707). Here the same
decision is a magic-bytes prefix test on the binary ``content`` column —
pure JVM expressions (hex of the first bytes), no UDF, so the filter stays
inside whole-stage codegen and runs during the scan.

Covered signatures → reference MIME set:
- RIFF....WAVE  → audio/wav, audio/x-wav, audio/vnd.wave
- fLaC          → audio/flac, audio/x-flac
- OggS          → audio/ogg
- ID3 / MPEG frame sync (FFEx/FFFx) → audio/mpeg, audio/x-mpeg
- ADTS AAC (FFF1/FFF9) → audio/aac, audio/x-aac
- FORM....AIFF  → audio/aiff, audio/x-aiff
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

AUDIO_MIME_TYPES = (
    "audio/mpeg",
    "audio/wav",
    "audio/ogg",
    "audio/flac",
    "audio/vnd.wave",
    "audio/x-wav",
    "audio/x-mpeg",
    "audio/x-flac",
    "audio/x-aiff",
    "audio/aiff",
    "audio/x-aac",
    "audio/aac",
)


def sniff_mime(content: Column) -> Column:
    """Best-effort MIME from magic bytes; NULL when unrecognized."""
    head4 = F.hex(F.substring(content, 1, 4))
    head3 = F.hex(F.substring(content, 1, 3))
    head2 = F.hex(F.substring(content, 1, 2))
    fmt = F.hex(F.substring(content, 9, 4))
    return (
        F.when((head4 == "52494646") & (fmt == "57415645"), "audio/wav")
        .when(head4 == "664C6143", "audio/flac")
        .when(head4 == "4F676753", "audio/ogg")
        .when(head3 == "494433", "audio/mpeg")
        .when(head2.isin("FFF1", "FFF9"), "audio/aac")
        .when(
            head2.isin("FFFB", "FFF3", "FFF2", "FFE3", "FFFA"), "audio/mpeg"
        )
        .when((head4 == "464F524D") & (fmt == "41494646"), "audio/aiff")
        .otherwise(F.lit(None).cast("string"))
    )


def is_audio_content(content: Column) -> Column:
    """The S4 filter: MIME recognized and in the allow-list."""
    return sniff_mime(content).isin(*AUDIO_MIME_TYPES)
