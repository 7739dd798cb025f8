"""Entity-registry tests: 13 schemas parse, keys/required/sport maps are
consistent, nested player sport path works (SURVEY.md §1.2-1.3)."""

import json

from pyspark.sql import functions as F

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.functions.expressions import (
    sport_ok,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.schemas import (
    ENTITIES,
    PRIMARY_KEYS,
    REQUIRED_FIELDS,
    SPORT_FIELD,
    all_schemas,
    entity_schema,
)


def test_registry_covers_13_entities():
    assert len(ENTITIES) == 13
    assert set(PRIMARY_KEYS) == set(ENTITIES)
    assert set(REQUIRED_FIELDS) == set(ENTITIES)
    assert set(SPORT_FIELD) <= set(ENTITIES)
    # the three sport-less child streams inherit via J1-J3 joins
    assert set(ENTITIES) - set(SPORT_FIELD) == {
        "event.stats", "event.timeline", "event.lineup",
    }


def test_pk_and_required_columns_exist_in_schema():
    schemas = all_schemas()
    for e in ENTITIES:
        names = {f.name for f in schemas[e].fields}
        for c in PRIMARY_KEYS[e]:
            assert c in names, f"{e}: pk column {c} missing"
        for c in REQUIRED_FIELDS[e]:
            assert c in names, f"{e}: required column {c} missing"
        sport = SPORT_FIELD.get(e)
        if sport and "." not in sport:
            assert sport in names


def test_event_schema_parses_and_drops_unknown_keys(spark):
    doc = {"idEvent": "1", "strSport": "Soccer", "intHomeScore": "2", "zzz_unknown": "x"}
    df = spark.createDataFrame([(json.dumps(doc),)], "value string")
    parsed = df.select(F.from_json("value", entity_schema("event")).alias("d")).select("d.*")
    row = parsed.collect()[0]
    assert row["idEvent"] == "1" and row["intHomeScore"] == "2"
    assert "zzz_unknown" not in parsed.columns


def test_player_nested_sport_path(spark):
    """P9 nested path: sport lives at lookup_player.strSport for player
    (reference: validate_json.py:529, 556-563)."""
    docs = [
        {"idPlayer": "7", "lookup_player": {"strSport": "Soccer"}},
        {"idPlayer": "8", "lookup_player": {"strSport": "Darts"}},
        {"idPlayer": "9"},  # missing nested struct -> tri-state False
    ]
    df = spark.createDataFrame([(json.dumps(d),) for d in docs], "value string")
    parsed = df.select(F.from_json("value", entity_schema("player")).alias("d")).select("d.*")
    out = [r[0] for r in parsed.select(sport_ok(F.col(SPORT_FIELD["player"]))).collect()]
    assert out == [True, False, False]
