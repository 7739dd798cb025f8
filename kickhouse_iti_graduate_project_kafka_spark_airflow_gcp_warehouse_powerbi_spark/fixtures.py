"""Deterministic domain fixtures per FIXTURES.md §A1 (seed=42).

Generates per-entity message dicts with the prescribed mix: valid soccer
rows (mixed-case sport strings), wrong-sport rows, zero-valued FK strings,
duplicate PKs with increasing ingested_at, and media-type variants.
"""

from __future__ import annotations

import random

BASE_TS = 1767225600.0  # 2026-01-01T00:00:00Z

SPORT_VALID = ["Soccer", "SOCCER", " soccer ", "soccer"]
SPORT_INVALID = ["Basketball", "", None, "Darts"]


def entity_fixtures(seed: int = 42) -> dict[str, list[dict]]:
    rng = random.Random(seed)
    fx: dict[str, list[dict]] = {}

    # leagues: L1-L4 soccer (L1 twice, newer season later), L5 basketball
    fx["league"] = [
        {"idLeague": "1", "strLeague": "Alpha", "strCountry": "X",
         "strCurrentSeason": "2025", "strGender": "Male", "strBadge": "http://b/1",
         "strSport": rng.choice(SPORT_VALID), "ingested_at": BASE_TS},
        {"idLeague": "1", "strLeague": "Alpha", "strCountry": "X",
         "strCurrentSeason": "2026", "strGender": "Male", "strBadge": "http://b/1",
         "strSport": "Soccer", "ingested_at": BASE_TS + 60},
        {"idLeague": "2", "strLeague": "Beta", "strCountry": "Y",
         "strCurrentSeason": "2026", "strGender": "Female", "strBadge": "http://b/2",
         "strSport": " soccer ", "ingested_at": BASE_TS},
        {"idLeague": "3", "strLeague": "Gamma", "strCountry": "Z",
         "strCurrentSeason": "2026", "strGender": "Male", "strBadge": "http://b/3",
         "strSport": "SOCCER", "ingested_at": BASE_TS},
        {"idLeague": "5", "strLeague": "Hoops", "strCountry": "X",
         "strCurrentSeason": "2026", "strGender": "Male", "strBadge": "http://b/5",
         "strSport": "Basketball", "ingested_at": BASE_TS},
    ]

    # teams: T1 (leagues 1,2), T2 (league 1 only), T3 non-soccer, T4 zero venue
    fx["team"] = [
        {"idTeam": "10", "strTeam": "Reds", "idLeague": "1", "idLeague2": "2",
         "idVenue": "100", "strCountry": "X", "intStadiumCapacity": "50000",
         "strSport": "Soccer", "ingested_at": BASE_TS},
        {"idTeam": "11", "strTeam": "Blues", "idLeague": "1",
         "idVenue": "101", "strCountry": "Y", "intStadiumCapacity": "40000",
         "strSport": "soccer", "ingested_at": BASE_TS},
        {"idTeam": "12", "strTeam": "Dunkers", "idLeague": "5",
         "idVenue": "102", "strCountry": "X", "intStadiumCapacity": "20000",
         "strSport": "Basketball", "ingested_at": BASE_TS},
        {"idTeam": "13", "strTeam": "Greens", "idLeague": "2",
         "idVenue": "0", "strCountry": "Z", "intStadiumCapacity": "30000",
         "strSport": "Soccer", "ingested_at": BASE_TS},
    ]

    fx["player"] = [
        {"idPlayer": "70", "idTeam": "10",
         "lookup_player": {"strSport": "Soccer", "strPlayer": "Ada",
                           "strPosition": "Forward", "strNationality": "X",
                           "dateBorn": "2000-01-01"},
         "ingested_at": BASE_TS},
        {"idPlayer": "71", "idTeam": "0",  # zero team FK -> NULL sk
         "lookup_player": {"strSport": "soccer", "strPlayer": "Bo",
                           "strPosition": "Keeper", "strNationality": "Y",
                           "dateBorn": "1999-05-05"},
         "ingested_at": BASE_TS},
        {"idPlayer": "72", "idTeam": "12",
         "lookup_player": {"strSport": "Basketball", "strPlayer": "Cy",
                           "strPosition": "Center", "strNationality": "X",
                           "dateBorn": "1998-09-09"},
         "ingested_at": BASE_TS},
    ]

    fx["venue"] = [
        {"idVenue": "100", "strVenue": "Big Park", "strLocation": "Town",
         "strCountry": "X", "intCapacity": "50000",
         "strSport": "Soccer", "ingested_at": BASE_TS},
        {"idVenue": "102", "strVenue": "Hoop Hall", "strLocation": "City",
         "strCountry": "X", "intCapacity": "20000",
         "strSport": "Basketball", "ingested_at": BASE_TS},
    ]

    # broadcasts: channel 900 twice (name changes; latest must win),
    # channel 0 (dropped from dim), non-soccer dropped
    fx["broadcast"] = [
        {"id": "500", "idEvent": "1000", "idChannel": "900", "strChannel": "SportsOne",
         "strCountry": "X", "strLogo": "http://l/1", "strTimeStamp": "2026-01-01 10:00:00",
         "dateEvent": "2026-01-01", "strSport": "Soccer", "ingested_at": BASE_TS},
        {"id": "501", "idEvent": "1001", "idChannel": "900", "strChannel": "Sports One HD",
         "strCountry": "X", "strLogo": "http://l/1b", "strTimeStamp": "2026-01-02 10:00:00",
         "dateEvent": "2026-01-02", "strSport": "Soccer", "ingested_at": BASE_TS + 120},
        {"id": "502", "idEvent": "1000", "idChannel": "0", "strChannel": "ZeroCh",
         "strCountry": "X", "strLogo": "http://l/0", "strTimeStamp": "2026-01-01 11:00:00",
         "dateEvent": "2026-01-01", "strSport": "Soccer", "ingested_at": BASE_TS},
        {"id": "503", "idEvent": "2000", "idChannel": "901", "strChannel": "HoopTV",
         "strCountry": "X", "strLogo": "http://l/2", "strTimeStamp": "2026-01-01 12:00:00",
         "dateEvent": "2026-01-01", "strSport": "Basketball", "ingested_at": BASE_TS},
    ]

    # events: 1000 soccer (two versions: scores update), 1001 soccer with
    # zero venue + null away score, 2000 basketball
    fx["event"] = [
        {"idEvent": "1000", "idLeague": "1", "idHomeTeam": "10", "idAwayTeam": "11",
         "idVenue": "100", "strStatus": "1H", "intHomeScore": "1", "intAwayScore": "0",
         "strTimestamp": "2026-01-01 15:00:00", "dateEvent": "2026-01-01",
         "strSport": "Soccer", "ingested_at": BASE_TS},
        {"idEvent": "1000", "idLeague": "1", "idHomeTeam": "10", "idAwayTeam": "11",
         "idVenue": "100", "strStatus": "FT", "intHomeScore": "2", "intAwayScore": "1",
         "strTimestamp": "2026-01-01 15:00:00", "dateEvent": "2026-01-01",
         "strSport": "Soccer", "ingested_at": BASE_TS + 7200},
        {"idEvent": "1001", "idLeague": "2", "idHomeTeam": "13", "idAwayTeam": "10",
         "idVenue": "0", "strStatus": "NS", "intHomeScore": None, "intAwayScore": None,
         "strTimestamp": None, "dateEvent": "2026-01-03",
         "strSport": "soccer", "ingested_at": BASE_TS},
        {"idEvent": "2000", "idLeague": "5", "idHomeTeam": "12", "idAwayTeam": "12",
         "idVenue": "102", "strStatus": "FT", "intHomeScore": "99", "intAwayScore": "98",
         "strTimestamp": "2026-01-01 18:00:00", "dateEvent": "2026-01-01",
         "strSport": "Basketball", "ingested_at": BASE_TS},
    ]

    fx["live_score"] = [
        {"idLiveScore": "800", "idEvent": "1000", "idLeague": "1",
         "intHomeScore": "1", "intAwayScore": "0", "strStatus": "1H",
         "strProgress": "23", "strSport": "Soccer", "ingested_at": BASE_TS + 600},
        {"idLiveScore": "801", "idEvent": "1000", "idLeague": "1",
         "intHomeScore": "2", "intAwayScore": "1", "strStatus": "2H",
         "strProgress": "78", "strSport": "Soccer", "ingested_at": BASE_TS + 4000},
        {"idLiveScore": "802", "idEvent": "2000", "idLeague": "5",
         "intHomeScore": "50", "intAwayScore": "48", "strStatus": "2Q",
         "strProgress": "19", "strSport": "Basketball", "ingested_at": BASE_TS + 600},
    ]

    # children without a sport column: events 1000/1001 soccer, 2000 not
    fx["event.stats"] = [
        {"idEvent": "1000", "idStatistic": "1", "strStat": "Shots",
         "intHome": "7", "intAway": "3", "ingested_at": BASE_TS},
        {"idEvent": "1001", "idStatistic": "1", "strStat": "Shots",
         "intHome": "0", "intAway": "0", "ingested_at": BASE_TS},
        {"idEvent": "2000", "idStatistic": "1", "strStat": "Rebounds",
         "intHome": "30", "intAway": "28", "ingested_at": BASE_TS},
    ]
    fx["event.timeline"] = [
        {"idTimeline": "9000", "idEvent": "1000", "strTimeline": "Goal",
         "idPlayer": "70", "idAssist": "0", "intTime": "23", "ingested_at": BASE_TS},
        {"idTimeline": "9001", "idEvent": "1000", "strTimeline": "Card",
         "idPlayer": "71", "idAssist": None, "intTime": None, "ingested_at": BASE_TS},
        {"idTimeline": "9002", "idEvent": "2000", "strTimeline": "Dunk",
         "idPlayer": "72", "idAssist": "0", "intTime": "5", "ingested_at": BASE_TS},
    ]
    fx["event.lineup"] = [
        {"idLineup": "7000", "idEvent": "1000", "strPosition": "Forward",
         "strSubstitute": "No", "idPlayer": "70", "ingested_at": BASE_TS},
        {"idLineup": "7001", "idEvent": "1000", "strPosition": "Keeper",
         "strSubstitute": "Yes", "idPlayer": "71", "ingested_at": BASE_TS},
        {"idLineup": "7002", "idEvent": "2000", "strPosition": "Center",
         "strSubstitute": "YES", "idPlayer": "72", "ingested_at": BASE_TS},
    ]
    # schedules: PK (idEvent, strTimestamp); one valid soccer row, one
    # rescheduled version of the same event, one non-soccer
    fx["schedule"] = [
        {"idEvent": "1001", "strTimestamp": "2026-01-03 15:00:00",
         "strEvent": "Greens vs Reds", "idHomeTeam": "13", "idAwayTeam": "10",
         "dateEvent": "2026-01-03", "strStatus": "NS", "strCountry": "Z",
         "strTime": "15:00:00", "strSport": "Soccer", "ingested_at": BASE_TS},
        {"idEvent": "1001", "strTimestamp": "2026-01-04 15:00:00",
         "strEvent": "Greens vs Reds", "idHomeTeam": "13", "idAwayTeam": "10",
         "dateEvent": "2026-01-04", "strStatus": "NS", "strCountry": "Z",
         "strTime": "15:00:00", "strSport": "soccer", "ingested_at": BASE_TS + 300},
        {"idEvent": "2001", "strTimestamp": "2026-01-03 19:00:00",
         "strEvent": "Dunkers vs Dunkers", "idHomeTeam": "12", "idAwayTeam": "12",
         "dateEvent": "2026-01-03", "strStatus": "NS", "strCountry": "X",
         "strTime": "19:00:00", "strSport": "Basketball", "ingested_at": BASE_TS},
    ]

    # live-event lookups: full event doc keyed by idEvent
    fx["live.event.lookup"] = [
        {"idEvent": "1000", "idLeague": "1", "idHomeTeam": "10",
         "idAwayTeam": "11", "strStatus": "FT",
         "strTimestamp": "2026-01-01 15:00:00", "dateEvent": "2026-01-01",
         "strPostponed": "no", "strLocked": "unlocked",
         "strSport": "SOCCER", "ingested_at": BASE_TS + 7500},
        {"idEvent": "2000", "idLeague": "5", "idHomeTeam": "12",
         "idAwayTeam": "12", "strStatus": "FT",
         "strTimestamp": "2026-01-01 18:00:00", "dateEvent": "2026-01-01",
         "strPostponed": "no", "strLocked": "unlocked",
         "strSport": "Basketball", "ingested_at": BASE_TS + 7500},
    ]

    fx["event.highlights"] = [
        {"idEvent": "1000", "strFilename": "f1", "strVideo": "http://v/1",
         "strThumb": "http://t/1", "strBanner": "", "strSport": "Soccer",
         "ingested_at": BASE_TS},
        {"idEvent": "1000", "strFilename": "f2", "strVideo": "",
         "strThumb": "http://t/2", "strBanner": "http://bn/2", "strSport": "Soccer",
         "ingested_at": BASE_TS},
        {"idEvent": "1001", "strFilename": "f3", "strVideo": None,
         "strThumb": None, "strBanner": None, "strSport": "soccer",
         "ingested_at": BASE_TS},
        {"idEvent": "2000", "strFilename": "f4", "strVideo": "http://v/4",
         "strThumb": "", "strBanner": "", "strSport": "Basketball",
         "ingested_at": BASE_TS},
    ]
    return fx
