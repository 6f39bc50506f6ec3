"""lookup_join broadcast vs shuffle mode equivalence."""

from __future__ import annotations

import json

from audios_to_dataset_spark.operators.lookup_join import lookup_join
from audios_to_dataset_spark.sources.metadata import load_jsonl_metadata


def test_shuffle_mode_matches_broadcast(spark, tmp_path):
    p = tmp_path / "m.jsonl"
    lines = [
        {"relative_path": "a.wav", "transcription": "ra", "snr": 1.0},
        {"file_name": "b.wav", "transcription": "nb"},
        {"file_name": "nested/c.wav", "transcription": "nc"},
    ]
    p.write_text("\n".join(json.dumps(x) for x in lines) + "\n")
    meta = load_jsonl_metadata(spark, str(p))
    files = spark.createDataFrame(
        [
            ("a.wav", "a.wav"),
            ("sub/b.wav", "b.wav"),
            ("nested/c.wav", "c.wav"),
            ("miss.wav", "miss.wav"),
        ],
        "relative_path string, file_name string",
    )
    kwargs = dict(rel_col="relative_path", name_col="file_name")
    bc = sorted(map(tuple, lookup_join(files, meta, **kwargs).collect()))
    sh = sorted(
        map(tuple, lookup_join(files, meta, broadcast=False, **kwargs).collect())
    )
    assert bc == sh
    by_rel = {r[0]: r for r in bc}
    # level 1: relative_path; level 2: file_name; level 3: name-as-rel;
    # miss → "-" default
    assert by_rel["a.wav"][3] == "ra"
    assert by_rel["sub/b.wav"][3] == "nb"
    assert by_rel["nested/c.wav"][3] == "nc"
    assert by_rel["miss.wav"][3] == "-"
