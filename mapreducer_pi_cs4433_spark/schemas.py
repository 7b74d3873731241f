"""Explicit schemas for the reference's CSV tables (SURVEY.md §1.1-1.2).

The reference parses every CSV positionally with ``String.split(",", -1)``
and per-field ``trim()`` (e.g. reference TaskA.java:31-40). Here each table
gets a typed StructType once; the loaders apply the trim normalization a
single time at read so every downstream query sees clean values.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# pages.csv: PersonID,Name,Nationality,Country Code,Hobby
# (header's "Country Code" is normalized to CountryCode on load)
PAGES_SCHEMA = StructType(
    [
        StructField("PersonID", IntegerType(), False),
        StructField("Name", StringType(), True),
        StructField("Nationality", StringType(), True),
        StructField("CountryCode", IntegerType(), True),
        StructField("Hobby", StringType(), True),
    ]
)

# friends.csv: FriendRel,PersonID,MyFriend,DateOfFriendship,Desc
FRIENDS_SCHEMA = StructType(
    [
        StructField("FriendRel", IntegerType(), False),
        StructField("PersonID", IntegerType(), True),
        StructField("MyFriend", IntegerType(), True),
        StructField("DateOfFriendship", DateType(), True),
        StructField("Desc", StringType(), True),
    ]
)

# access_logs.csv: AccessID,ByWho,WhatPage,TypeOfAccess,AccessTime
ACCESS_LOGS_SCHEMA = StructType(
    [
        StructField("AccessID", IntegerType(), False),
        StructField("ByWho", IntegerType(), True),
        StructField("WhatPage", IntegerType(), True),
        StructField("TypeOfAccess", StringType(), True),
        StructField("AccessTime", TimestampType(), True),
    ]
)

# Columns that must be trimmed on load (leading-space values exist in the
# raw data, e.g. hobby " Field" — reference pages.csv:5; SURVEY trap #9).
TRIM_COLUMNS = {
    "pages": ["Name", "Nationality", "Hobby"],
    "friends": ["Desc"],
    "access_logs": ["TypeOfAccess"],
}

# Driver-side synthetic star schema table names (TESTDATA.md).
DRIVER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
