"""Widening lattice parity (§1.3, src/main.rs:132-142, 211-238)."""

from __future__ import annotations

from pyspark.sql import types as T

from audios_to_dataset_spark.schema import hf_feature, widen_type


def test_numbers_collapse_to_double():
    for dt in (T.IntegerType(), T.LongType(), T.FloatType(), T.DoubleType()):
        assert widen_type(dt) == T.DoubleType()


def test_scalars_keep_identity():
    assert widen_type(T.BooleanType()) == T.BooleanType()
    assert widen_type(T.StringType()) == T.StringType()


def test_arrays_widen_elementwise():
    assert widen_type(T.ArrayType(T.LongType())) == T.ArrayType(T.DoubleType())
    assert widen_type(T.ArrayType(T.ArrayType(T.BooleanType()))) == \
        T.ArrayType(T.ArrayType(T.BooleanType()))


def test_outside_lattice_collapses_to_string():
    assert widen_type(T.NullType()) == T.StringType()
    assert widen_type(T.StructType([])) == T.StringType()
    assert widen_type(T.MapType(T.StringType(), T.LongType())) == \
        T.StringType()
    assert widen_type(T.TimestampType()) == T.StringType()


def test_hf_features():
    # metadata_feature_value parity (src/main.rs:249-259)
    assert hf_feature(T.BooleanType()) == {"dtype": "bool", "_type": "Value"}
    assert hf_feature(T.DoubleType()) == {
        "dtype": "float64", "_type": "Value"
    }
    assert hf_feature(T.StringType()) == {"dtype": "string", "_type": "Value"}
    assert hf_feature(T.ArrayType(T.DoubleType())) == {
        "_type": "Sequence",
        "feature": {"dtype": "float64", "_type": "Value"},
    }
