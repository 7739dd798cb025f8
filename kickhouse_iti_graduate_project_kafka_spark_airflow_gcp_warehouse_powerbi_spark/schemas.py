"""Entity registry: the 13 TheSportsDB stream schemas + key/validity maps.

Captures the reference's data model (SURVEY.md §1.2-§1.3; reference:
spark/jobs/validate_json.py:53-67 primary keys, :87-494 schemas, :497-515
required fields, :518-530 sport-field paths). Every business field is
StringType — TheSportsDB serializes numerics as strings and re-typing
happens at the warehouse layer, not at parse (SURVEY.md 'hard parts': cast
at silver so rejected rows stay lossless). The only non-strings are
``ingested_at`` (epoch seconds, double) and the single nested struct
``player.lookup_player``.

Usage: ``entity_schema("event")`` -> StructType;
``PRIMARY_KEYS / REQUIRED_FIELDS / SPORT_FIELD`` drive the validator.
"""

from __future__ import annotations

from pyspark.sql import types as T

# field inventories per entity (business columns; ingested_at appended)
_FIELDS: dict[str, list[str]] = {
    "broadcast": [
        "id", "idEvent", "intDivision", "idChannel", "strChannel", "strCountry",
        "strEventCountry", "strSport", "strEvent", "strSeason", "dateEvent",
        "strTime", "strTimeStamp", "strLogo", "strEventThumb", "strEventPoster",
        "strEventBanner", "strEventSquare",
    ],
    "event": [
        "idEvent", "idLeague", "idHomeTeam", "idAwayTeam", "idVenue", "strVenue",
        "strEvent", "strSeason", "strCountry", "strCity", "strSport",
        "strDescriptionEN", "strHomeTeam", "strAwayTeam", "intHomeScore",
        "intAwayScore", "intRound", "intSpectators", "intScore", "intScoreVotes",
        "strResult", "strGroup", "strOfficial", "strPoster", "strSquare",
        "strThumb", "strBanner", "strMap", "strTweet1", "strStatus", "dateEvent",
        "strEventTime", "strTimestamp", "strTime", "strHomeTeamBadge",
        "strAwayTeamBadge", "strFilename",
    ],
    "team": [
        "idTeam", "idESPN", "idVenue", "idLeague", "idLeague2", "idLeague3",
        "idLeague4", "idLeague5", "idLeague6", "idLeague7", "strLeague",
        "strLeague2", "strLeague3", "strLeague4", "strLeague5", "strLeague6",
        "strLeague7", "strDivision", "intFormedYear", "strTeam",
        "strTeamAlternate", "strTeamShort", "strSport", "strStadium",
        "intStadiumCapacity", "strLocation", "strCountry", "strKeywords",
        "strRSS", "strDescriptionEN", "strColour1", "strColour2", "strColour3",
        "strEquipment", "strGender", "strWebsite", "strBadge", "strLogo",
        "strFanart1", "strFanart2", "strFanart3", "strFanart4", "strBanner",
    ],
    "live.event.lookup": [
        "idEvent", "idAPIfootball", "strEvent", "strEventAlternate",
        "strFilename", "strSport", "idLeague", "strLeague", "strLeagueBadge",
        "strSeason", "strDescriptionEN", "strHomeTeam", "strAwayTeam",
        "intHomeScore", "intRound", "intAwayScore", "intSpectators",
        "strOfficial", "strTimestamp", "dateEvent", "dateEventLocal", "strTime",
        "strTimeLocal", "strGroup", "idHomeTeam", "strHomeTeamBadge",
        "idAwayTeam", "strAwayTeamBadge", "intScore", "intScoreVotes",
        "strResult", "idVenue", "strVenue", "strCountry", "strCity", "strPoster",
        "strSquare", "strFanart", "strThumb", "strBanner", "strMap", "strTweet1",
        "strTweet2", "strTweet3", "strVideo", "strStatus", "strPostponed",
        "strLocked",
    ],
    "league": [
        "idLeague", "idAPIfootball", "idSoccerXML", "idCup", "intDivision",
        "strCurrentSeason", "intFormedYear", "strGender", "strTvRights",
        "strLeague", "strSport", "strLeagueAlternate", "strCountry",
        "strDescriptionEN", "strFanart1", "strFanart2", "strFanart3",
        "strBanner", "strBadge", "strLogo", "strPoster", "strTrophy",
        "strNaming", "strWebsite", "strFacebook", "strRSS",
    ],
    "venue": [
        "idVenue", "idDupe", "intFormedYear", "strCost", "strArchitect",
        "strVenueSponsor", "strVenueAlternate", "strVenue", "strSport",
        "strLocation", "strCountry", "intCapacity", "strDescriptionEN",
        "strFanart1", "strFanart2", "strFanart3", "strThumb", "strLogo",
        "strMap", "strWebsite", "strCreativeCommons", "strTimezone",
    ],
    "schedule": [
        "idEvent", "idHomeTeam", "idAwayTeam", "strEvent", "strSport",
        "strHomeTeam", "strAwayTeam", "intHomeScore", "intAwayScore",
        "strStatus", "strCountry", "strVenue", "strThumb", "strHomeTeamBadge",
        "strAwayTeamBadge", "strTimeLocal", "strTime", "strTimestamp",
        "dateEvent",
    ],
    "live_score": [
        "idLiveScore", "idEvent", "idLeague", "idHomeTeam", "idAwayTeam",
        "intHomeScore", "intAwayScore", "strLeague", "strHomeTeam",
        "strAwayTeam", "strStatus", "strSport", "strEventTime", "dateEvent",
        "strHomeTeamBadge", "strAwayTeamBadge", "intEventScore",
        "intEventScoreTotal", "strProgress", "updated",
    ],
    "event.stats": [
        "idEvent", "idStatistic", "idApiFootball", "strEvent", "strStat",
        "intHome", "intAway",
    ],
    "event.timeline": [
        "idTimeline", "idEvent", "strTimeline", "strTimelineDetail", "strHome",
        "strEvent", "idAPIfootball", "idPlayer", "strPlayer", "strCountry",
        "idAssist", "strAssist", "intTime", "idTeam", "strTeam", "strComment",
        "dateEvent", "strSeason",
    ],
    "event.highlights": [
        "idEvent", "idAPIfootball", "idHomeTeam", "idAwayTeam", "idVenue",
        "strEvent", "strEventAlternate", "strFilename", "strSport", "idLeague",
        "strLeague", "strLeagueBadge", "strSeason", "strDescriptionEN",
        "strHomeTeam", "strAwayTeam", "intHomeScore", "intAwayScore",
        "intRound", "intScore", "intScoreVotes", "strResult", "strOfficial",
        "strGroup", "strHomeTeamBadge", "strAwayTeamBadge", "strCountry",
        "strPoster", "strSquare", "strFanart", "strThumb", "strBanner",
        "strMap", "strTweet1", "strTweet2", "strTweet3", "strVideo",
        "dateEvent", "strTime", "strStatus", "strPostponed", "strLocked",
    ],
    "event.lineup": [
        "idLineup", "idEvent", "strEvent", "strPosition", "strPositionShort",
        "strHome", "strSubstitute", "intSquadNumber", "strCutout", "idPlayer",
        "strPlayer", "idTeam", "strTeam", "strSeason", "strCountry",
    ],
}

_LOOKUP_PLAYER_FIELDS = [
    "idTeam2", "idTeamNational", "idAPIfootball", "idPlayerManager",
    "idWikidata", "idTransferMkt", "idESPN", "intSoccerXMLTeamID",
    "strNationality", "strPlayer", "strPlayerAlternate", "strSport",
    "dateBorn", "dateDied", "dateSigned", "strSigning", "strWage",
    "strOutfitter", "strKit", "strAgent", "strBirthLocation", "strEthnicity",
    "strGender", "strSide", "strCollege", "strFacebook", "strWebsite",
    "strTwitter", "strInstagram", "strYoutube", "strThumb", "strPoster",
    "strCutout", "strRender", "strBanner", "strFanart1", "strFanart2",
    "strFanart3", "strFanart4", "strCreativeCommons", "strNumber",
    "strPosition", "strStatus", "strHeight", "strWeight", "strTeam",
    "strTeam2", "strDescriptionEN",
]

ENTITIES: tuple[str, ...] = tuple(list(_FIELDS) + ["player"])

# reference: validate_json.py:53-67
PRIMARY_KEYS: dict[str, list[str]] = {
    "broadcast": ["id", "strTimeStamp"],
    "event": ["idEvent"],
    "team": ["idTeam"],
    "league": ["idLeague"],
    "venue": ["idVenue"],
    "schedule": ["idEvent", "strTimestamp"],
    "live_score": ["idLiveScore"],
    "live.event.lookup": ["idEvent"],
    "event.stats": ["idEvent", "idStatistic"],
    "event.timeline": ["idTimeline"],
    "event.highlights": ["idEvent", "strFilename"],
    "event.lineup": ["idLineup"],
    "player": ["idPlayer"],
}

# reference: validate_json.py:497-515
REQUIRED_FIELDS: dict[str, list[str]] = {
    "broadcast": ["id", "idEvent", "strSport", "ingested_at"],
    "event": ["idEvent", "ingested_at"],
    "team": ["idTeam", "strTeam", "strSport", "idLeague", "ingested_at"],
    "league": ["idLeague", "strLeague", "strSport", "strCountry", "ingested_at"],
    "venue": ["idVenue", "strVenue", "strSport", "strLocation", "strCountry", "ingested_at"],
    "schedule": [
        "idEvent", "strEvent", "strSport", "idHomeTeam", "idAwayTeam",
        "strTimestamp", "dateEvent", "strStatus", "strCountry", "ingested_at",
    ],
    "live_score": [
        "idLiveScore", "idEvent", "strSport", "idLeague", "idHomeTeam",
        "idAwayTeam", "intHomeScore", "intAwayScore", "strStatus",
        "strEventTime", "dateEvent", "updated", "ingested_at",
    ],
    "live.event.lookup": [
        "idEvent", "strSport", "idLeague", "idHomeTeam", "idAwayTeam",
        "strStatus", "strTimestamp", "dateEvent", "ingested_at",
    ],
    "event.stats": ["idEvent", "idStatistic", "strStat", "intHome", "intAway", "ingested_at"],
    "event.timeline": ["idTimeline", "idEvent", "strTimeline", "idPlayer", "ingested_at"],
    "event.highlights": [
        "idEvent", "idAPIfootball", "strEvent", "intHomeScore", "intAwayScore", "ingested_at",
    ],
    "event.lineup": ["idLineup", "idEvent", "strPosition", "idPlayer", "ingested_at"],
    "player": ["idPlayer", "idTeam", "lookup_player", "ingested_at"],
}

#: column (possibly nested path) holding the sport per entity; entities
#: absent here carry no sport field and inherit it by joining `event`
#: (J1-J3). reference: validate_json.py:518-530
SPORT_FIELD: dict[str, str] = {
    "broadcast": "strSport",
    "event": "strSport",
    "team": "strSport",
    "league": "strSport",
    "venue": "strSport",
    "schedule": "strSport",
    "live_score": "strSport",
    "live.event.lookup": "strSport",
    "event.highlights": "strSport",
    "player": "lookup_player.strSport",
}

#: envelope/derived columns never included in the payload hash
#: (reference: validate_json.py:532-537)
HASH_EXCLUDE: frozenset[str] = frozenset(
    {"ingested_at", "evt_ts", "pk", "is_valid", "kafka_ts", "json_str",
     "parse_error", "sport_ok"}
)


def entity_schema(entity: str) -> T.StructType:
    """StructType for one entity stream: all-strings + ingested_at double;
    `player` additionally nests the lookup_player struct."""
    if entity == "player":
        nested = T.StructType(
            [T.StructField(f, T.StringType()) for f in _LOOKUP_PLAYER_FIELDS]
        )
        fields = [
            T.StructField("idPlayer", T.StringType()),
            T.StructField("idTeam", T.StringType()),
            T.StructField("lookup_player", nested),
            T.StructField("ingested_at", T.DoubleType()),
        ]
        return T.StructType(fields)
    if entity not in _FIELDS:
        raise KeyError(f"unknown entity {entity!r}; known: {ENTITIES}")
    return T.StructType(
        [T.StructField(f, T.StringType()) for f in _FIELDS[entity]]
        + [T.StructField("ingested_at", T.DoubleType())]
    )


def all_schemas() -> dict[str, T.StructType]:
    return {e: entity_schema(e) for e in ENTITIES}
