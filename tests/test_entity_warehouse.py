"""End-to-end star-schema build on the real 13-entity model — the A4
golden-table assertions from FIXTURES.md (soccer-only filtering, surrogate
keys, zero-FK NULL-ing, array flattening, J1-J3 sport-inheritance drops,
A7 channel dedup, W8 media_type, latest-state hub view)."""

import pytest

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.fixtures import entity_fixtures
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.functions.expressions import (
    surrogate_key,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.plans.entity_warehouse import (
    build_warehouse,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.schemas import (
    entity_schema,
)


@pytest.fixture(scope="module")
def warehouse(spark):
    fx = entity_fixtures()
    bronze = {
        name: spark.createDataFrame(rows, entity_schema(name)) for name, rows in fx.items()
    }
    return {k: v.cache() for k, v in build_warehouse(bronze).items()}


def test_dims_soccer_only_and_renames(warehouse):
    leagues = warehouse["dim_league"].collect()
    ids = sorted(r["idLeague"] for r in leagues)
    assert ids == [1, 1, 2, 3]  # basketball league 5 filtered; league 1 has 2 versions
    assert all(r["badge_url"].startswith("http://b/") for r in leagues)

    venues = warehouse["dim_venue"].collect()
    assert [r["idVenue"] for r in venues] == [100]  # Hoop Hall dropped


def test_dim_team_league_ids_array_and_zero_venue(warehouse):
    teams = {r["idTeam"]: r for r in warehouse["dim_team"].collect()}
    assert set(teams) == {10, 11, 13}  # basketball team 12 dropped
    assert teams[10]["league_ids"] == [1, 2]  # W5 flatten, nulls compacted
    assert teams[11]["league_ids"] == [1]
    assert teams[13]["venue_sk"] is None  # W3: idVenue='0' -> NULL


def test_dim_player_nested_sport_path(warehouse):
    players = {r["idPlayer"]: r for r in warehouse["dim_player"].collect()}
    assert set(players) == {70, 71}  # nested Basketball dropped
    assert players[71]["team_sk"] is None  # zero idTeam
    assert players[70]["player_name"] == "Ada"


def test_dim_channel_anylast_dedup(warehouse):
    channels = warehouse["dim_channel"].collect()
    assert len(channels) == 1  # channel 0 dropped, basketball dropped, 900 deduped
    ch = channels[0]
    assert ch["idChannel"] == 900
    assert ch["channel_name"] == "Sports One HD"  # latest by ingested_at wins (A7)


def test_fact_event_scalars_and_hub_view(spark, warehouse):
    fact = warehouse["fact_event"].collect()
    assert len(fact) == 3  # 2 versions of 1000 + 1001; basketball 2000 dropped
    by_key = {}
    for r in fact:
        by_key.setdefault(r["idEvent"], []).append(r)
    e1001 = by_key[1001][0]
    assert e1001["venue_sk"] is None  # W3
    assert e1001["total_score"] is None  # W7: null + null stays null
    assert e1001["scheduled_utc"] is not None  # W6 fallback to dateEvent
    assert e1001["event_month"] == "202601"  # W11

    latest = {r["idEvent"]: r for r in warehouse["v_fact_event_latest"].collect()}
    assert len(latest) == 2
    assert latest[1000]["status"] == "FT"  # A5/A6: newest version wins
    assert latest[1000]["total_score"] == 3
    # surrogate keys match the dim side (J5 star-join integrity, W2)
    sk = spark.createDataFrame([("1",)], "idLeague string").select(
        surrogate_key("idLeague").alias("sk")
    ).collect()[0]["sk"]
    assert latest[1000]["league_sk"] == sk


def test_sport_inheritance_joins_drop_non_soccer_children(warehouse):
    stats = warehouse["fact_event_stat"].collect()
    assert sorted(r["idEvent"] for r in stats) == [1000, 1001]  # J1: 2000 dropped
    tl = {r["idTimeline"]: r for r in warehouse["fact_timeline"].collect()}
    assert set(tl) == {9000, 9001}  # J2
    assert tl[9000]["assist_sk"] is None  # W3: idAssist='0'
    assert tl[9001]["minute_norm"] == -1  # W12 null-normalized minute
    lu = {r["idLineup"]: r for r in warehouse["fact_lineup"].collect()}
    assert set(lu) == {7000, 7001}  # J3
    assert lu[7000]["is_substitute"] == 0 and lu[7001]["is_substitute"] == 1  # W9


def test_fact_highlight_media_type(warehouse):
    hl = {r["filename"]: r for r in warehouse["fact_highlight"].collect()}
    assert set(hl) == {"f1", "f2", "f3"}  # basketball f4 dropped
    assert hl["f1"]["media_type"] == "video" and hl["f1"]["url"] == "http://v/1"
    # reference quirk preserved (DDL 433-437): media_type skips empty strings
    # but url is a plain coalesce — '' strVideo wins the url slot
    assert hl["f2"]["media_type"] == "thumb" and hl["f2"]["url"] == ""
    assert hl["f3"]["media_type"] == "asset" and hl["f3"]["url"] == ""  # W8 default


def test_fact_event_snapshot_timeseries(warehouse):
    snaps = warehouse["fact_event_snapshot"].collect()
    assert sorted(r["idLiveScore"] for r in snaps) == [800, 801]
    assert all(r["snapshot_ts"] is not None for r in snaps)
