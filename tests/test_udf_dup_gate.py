"""Plan gate: no declared query may evaluate the same Python UDF twice
(VERDICT r12 item 8 — the §4.4 wins must not silently regress).

The r12 optimization round found 4 queries whose physical plans carried
DUPLICATED ArrowEvalPython/BatchEvalPython chains (the optimizer pushed
an explode-inferred filter below an Exchange WITH a copy of the decode
UDF — the whole corpus decoded twice). The fixes (asNondeterministic
marks, fingerprint checkpoints) are plan properties a future Catalyst
upgrade or an innocent plan edit can undo; this test pins them.

Scope: every query in plans.multimodal — the only module whose declared
batch plans reach Python (per the repo convention, pandas UDFs are for
WAV/MIME/multimodal byte work only; tools/udf_dup_audit.py sweeps all
406 and found offenders only here). Plan-only, no execution.
"""

from __future__ import annotations

import re


def _python_eval_sigs(txt: str) -> list[str]:
    """Arguments signatures of every ArrowEvalPython/BatchEvalPython
    node, with expression ids stripped so two eval sites of the same
    UDF call compare equal (same normalization as
    tools/udf_dup_audit.py)."""
    sigs = []
    lines = txt.splitlines()
    for i, ln in enumerate(lines):
        if re.match(r"^\(\d+\) (ArrowEvalPython|BatchEvalPython)", ln):
            for j in range(i + 1, min(i + 5, len(lines))):
                if lines[j].startswith("Arguments:"):
                    sig = re.sub(r"#\d+", "#", lines[j])
                    sig = re.sub(r"\[pythonUDF\d+#\]", "", sig)
                    sigs.append(sig)
                    break
    return sigs


def test_no_duplicated_python_eval_in_multimodal_plans(spark, sf_dir):
    from audios_to_dataset_spark.plans import multimodal

    bad: dict[str, list[str]] = {}
    for name, fn in sorted(multimodal.QUERIES.items()):
        df = fn(spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")
        )
        sigs = _python_eval_sigs(txt)
        dup = sorted({s for s in sigs if sigs.count(s) > 1})
        if dup:
            bad[name] = [f"{sigs.count(s)}x {s[:120]}" for s in dup]
    assert bad == {}, f"duplicated python-eval chains: {bad}"
