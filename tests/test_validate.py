"""Constraint-validation operator (the reference's CHECK/UNIQUE/NOT NULL)."""

from __future__ import annotations

from mtg_vector_db_spark.operators import validate as V


def test_validate_splits_and_tags_first_failure(spark):
    df = spark.createDataFrame(
        [
            (1, "main_rule", "100.1", "ok"),
            (2, "subrule", "100.1a", "ok"),
            (3, "bogus_type", "100.2", "enum fail"),
            (4, "main_rule", None, "null rule number"),
            (5, None, "xyz", "two failures -> first rule wins"),
        ],
        "id long, rule_type string, rule_number string, note string",
    )
    rules = [
        V.not_null("rule_type"),
        V.enum_in("rule_type", ["main_rule", "subrule"]),
        V.not_null("rule_number"),
        V.matches("rule_number", r"^\d+\.\d+[a-z]*$"),
    ]
    valid, quarantined = V.validate(df, rules)
    assert {r["id"] for r in valid.collect()} == {1, 2}
    reasons = {r["id"]: r["reject_reason"] for r in quarantined.collect()}
    assert reasons == {
        3: "rule_type_enum",
        4: "rule_number_not_null",
        5: "rule_type_not_null",  # first failed rule, not the later ones
    }


def test_validate_unique_key_keeps_first(spark):
    df = spark.createDataFrame(
        [("A", 1), ("A", 2), ("B", 1)], "card_name string, v long"
    )
    valid, quarantined = V.validate(df, [V.non_empty("card_name")], unique_key="card_name")
    assert valid.count() == 2
    (q,) = quarantined.collect()
    assert q["card_name"] == "A" and q["reject_reason"] == "card_name_not_unique"
    # deterministic keep: first by full-row order
    kept = {(r["card_name"], r["v"]) for r in valid.collect()}
    assert kept == {("A", 1), ("B", 1)}


def test_validate_null_predicate_counts_as_failure(spark):
    df = spark.createDataFrame([(1, None)], "id long, x double")
    valid, quarantined = V.validate(df, [V.in_range("x", 0, 1)])
    assert valid.count() == 0
    assert quarantined.collect()[0]["reject_reason"] == "x_range"
