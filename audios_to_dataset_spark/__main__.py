"""CLI entry point: ``python -m audios_to_dataset_spark --input … --output …``

Flag-for-flag parity with the reference binary's arguments
(/root/reference/src/main.rs:55-95):

  --input, --output, --format {parquet,duckdb,orc}, --files-per-db,
  --max-depth-size, --check-mime-type, --num-threads,
  --parquet-compression, --metadata-file

``--num-threads`` maps to the local-mode core count (the reference sizes
its rayon pool with it; on a cluster you would drop it and let the
scheduler own parallelism).
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="audios_to_dataset_spark",
        description=(
            "Turn a folder of audio files into chunked Parquet or DuckDB "
            "datasets mirroring the Hugging Face `datasets` layout."
        ),
    )
    p.add_argument("--input", required=True, help="input folder (recursive)")
    p.add_argument("--output", required=True, help="output folder")
    p.add_argument(
        "--format", choices=("parquet", "duckdb", "orc"), default="parquet"
    )
    p.add_argument("--files-per-db", type=int, default=500)
    p.add_argument("--max-depth-size", type=int, default=50)
    p.add_argument("--check-mime-type", action="store_true")
    p.add_argument("--num-threads", type=int, default=5)
    p.add_argument(
        "--parquet-compression",
        choices=(
            "uncompressed", "snappy", "gzip", "lzo", "brotli", "lz4",
            "zstd", "lz4raw",
        ),
        default="snappy",
    )
    p.add_argument("--metadata-file", default=None)
    p.add_argument(
        "--incremental",
        action="store_true",
        help="skip files already present in the output dir and continue "
        "shard numbering (engine extension; parquet output only)",
    )
    p.add_argument(
        "--sniff-formats",
        action="store_true",
        help="add an audio_format column sniffed from container headers "
        "(wav/flac/ogg/opus/mp3) — engine extension, no reference analog",
    )
    p.add_argument(
        "--segment-seconds",
        type=float,
        default=None,
        help="engine extension: split each WAV into fixed-duration"
        " standalone segments before sharding",
    )
    p.add_argument(
        "--audio-stats",
        action="store_true",
        help="engine extension: add rms/peak/clipped_frac signal QA"
        " columns from the PCM payload",
    )
    p.add_argument(
        "--manifest",
        action="store_true",
        help="engine extension: write _manifest.jsonl + _SUCCESS after a"
        " parquet run (per-shard rows/bytes/duration commit record;"
        " merged across --incremental runs)",
    )
    p.add_argument(
        "--transcode-flac",
        action="store_true",
        help="engine extension: losslessly transcode 16-bit PCM WAV"
        " payloads to FLAC at the sink (bit-exact recovery; paths get"
        " a .flac extension; non-PCM16 payloads pass through)",
    )
    p.add_argument(
        "--from-duckdb",
        action="store_true",
        help="engine extension (migration): treat --input as a"
        " directory of <idx>.duckdb shards (the reference's DuckDB"
        " output) and convert it to the HF parquet layout",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if not os.path.isdir(args.input):
        print(f"error: input folder does not exist: {args.input}",
              file=sys.stderr)
        return 2

    os.environ.setdefault("SPARK_GRAFT_CPUS", str(args.num_threads))
    from .pipeline import run_pipeline
    from .session import get_session

    spark = get_session("audios-to-dataset")
    if args.from_duckdb:
        if args.format != "parquet":
            print("error: --from-duckdb converts to parquet only",
                  file=sys.stderr)
            return 2
        from .pipeline import convert_duckdb_to_parquet

        rows = convert_duckdb_to_parquet(
            spark,
            args.input,
            args.output,
            files_per_shard=args.files_per_db,
            compression=args.parquet_compression,
            manifest=args.manifest,
        )
        print(f"converted {sum(r.n_rows for r in rows)} rows into "
              f"{len(rows)} parquet shard(s) at {args.output}")
        return 0
    receipts = run_pipeline(
        spark,
        args.input,
        args.output,
        metadata_file=args.metadata_file,
        output_format=args.format,
        compression=args.parquet_compression,
        files_per_shard=args.files_per_db,
        max_depth=args.max_depth_size,
        check_mime_type=args.check_mime_type,
        segment_seconds=args.segment_seconds,
        audio_stats=args.audio_stats,
        sniff_formats=args.sniff_formats,
        incremental=args.incremental,
        manifest=args.manifest,
        transcode_flac=args.transcode_flac,
    )
    total = sum(r.n_rows for r in receipts)
    for r in sorted(receipts, key=lambda r: r.shard):
        # native-writer formats (orc) report per-shard counts without a
        # file path (the writer owns file naming)
        dest = (
            os.path.basename(r.out_path)
            if "out_path" in r.__fields__
            else f"shard={r.shard}"
        )
        print(
            f"Successfully wrote {r.n_rows} records to {dest}."
        )
    print(f"{total} records in {len(receipts)} shard(s).")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
