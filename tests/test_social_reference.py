"""Reference-fixture tests: run Tasks A-H + WordCount on the reference's own
sample data (/root/reference/data, read-only) and assert both hand-computed
golden values (SURVEY.md §5) and full-result DuckDB twins, including every
semantic trap in SURVEY.md §4."""

from __future__ import annotations

import os

import duckdb
import pytest

from mapreducer_pi_cs4433_spark.operators import social
from mapreducer_pi_cs4433_spark.sources import loaders

from .conftest import REFERENCE_DATA
from .oracle import compare

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DATA), reason="reference data not mounted"
)


@pytest.fixture(scope="module")
def pages(spark):
    return loaders.load_pages(spark, f"{REFERENCE_DATA}/pages.csv").cache()


@pytest.fixture(scope="module")
def friends(spark):
    return loaders.load_friends(spark, f"{REFERENCE_DATA}/friends.csv").cache()


@pytest.fixture(scope="module")
def access_logs(spark):
    return loaders.load_access_logs(spark, f"{REFERENCE_DATA}/access_logs.csv").cache()


@pytest.fixture(scope="module")
def corpus(spark):
    return loaders.load_corpus(spark, "/root/reference/data.txt")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"""CREATE VIEW pages AS
        SELECT PersonID::INT AS PersonID, trim(Name) AS Name,
               trim(Nationality) AS Nationality,
               "Country Code"::INT AS CountryCode, trim(Hobby) AS Hobby
        FROM read_csv('{REFERENCE_DATA}/pages.csv', header=true)"""
    )
    con.execute(
        f"""CREATE VIEW friends AS
        SELECT FriendRel::INT AS FriendRel, PersonID::INT AS PersonID,
               MyFriend::INT AS MyFriend, DateOfFriendship, trim("Desc") AS "Desc"
        FROM read_csv('{REFERENCE_DATA}/friends.csv', header=true)"""
    )
    con.execute(
        f"""CREATE VIEW access_logs AS
        SELECT AccessID::INT AS AccessID, ByWho::INT AS ByWho,
               WhatPage::INT AS WhatPage, trim(TypeOfAccess) AS TypeOfAccess,
               AccessTime
        FROM read_csv('{REFERENCE_DATA}/access_logs.csv', header=true)"""
    )
    yield con
    con.close()


def test_task_a(pages, duck):
    df = social.filter_by_nationality(pages)
    assert df.collect() == [("Michelle Keller", "Stargazing")]
    compare(
        df, duck, "SELECT Name, Hobby FROM pages WHERE Nationality = 'Russia'"
    )


def test_task_a_trim_trap(pages):
    # SURVEY trap #9: ' Field' (pages.csv:5) must be trimmed at load.
    hobbies = {r.Hobby for r in pages.select("Hobby").collect()}
    assert "Field" in hobbies and " Field" not in hobbies


def test_task_b_counts(access_logs, pages, duck):
    df = social.page_access_counts(access_logs, pages)
    compare(
        df,
        duck,
        """SELECT p.PersonID AS PageID, p.Name AS PageName, COUNT(*) AS AccessCount
           FROM access_logs a JOIN pages p ON a.WhatPage = p.PersonID
           GROUP BY 1, 2""",
    )


def test_task_b_top10(access_logs, pages):
    rows = social.top_k_pages(access_logs, pages, 10).collect()
    assert len(rows) == 10
    counts = [r.AccessCount for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_task_c(pages, duck):
    df = social.nationality_counts(pages)
    # SURVEY §5: 3 countries with 2 citizens, 14 with 1.
    rows = df.collect()
    assert sorted(r.Citizens for r in rows).count(2) == 3
    assert len(rows) == 17
    compare(
        df,
        duck,
        "SELECT Nationality, COUNT(*) AS Citizens FROM pages GROUP BY 1",
    )


def test_task_d(pages, friends, duck):
    df = social.friend_in_degree(pages, friends)
    rows = {r.PersonID: r.FriendCount for r in df.collect()}
    assert len(rows) == 20  # every person present, zero-fill (trap: 0-indegree)
    assert rows[18] == 3  # duplicate edge (2,18) counted twice (trap #5)
    assert rows[3] == 0 and rows[11] == 0  # zero in-edges included
    compare(
        df,
        duck,
        """SELECT p.PersonID, p.Name, COALESCE(d.cnt, 0) AS FriendCount
           FROM pages p LEFT JOIN
             (SELECT MyFriend, COUNT(*) AS cnt FROM friends GROUP BY 1) d
           ON p.PersonID = d.MyFriend""",
    )


def test_task_e(pages, access_logs, duck):
    df = social.activity_summary(pages, access_logs)
    rows = {r.PersonID: (r.TotalAccesses, r.DistinctPages) for r in df.collect()}
    assert len(rows) == 20
    assert rows[11] == (0, 0)  # zero-activity person included (trap #6)
    assert all(d <= t for t, d in rows.values())  # invariant
    compare(
        df,
        duck,
        """SELECT p.PersonID, p.Name,
                  COALESCE(a.t, 0) AS TotalAccesses,
                  COALESCE(a.d, 0) AS DistinctPages
           FROM pages p LEFT JOIN
             (SELECT ByWho, COUNT(*) AS t, COUNT(DISTINCT WhatPage) AS d
              FROM access_logs GROUP BY 1) a
           ON p.PersonID = a.ByWho""",
    )


def test_task_f(pages, friends, access_logs, duck):
    df = social.unvisited_friend_owners(pages, friends, access_logs)
    ids = {r.PersonID for r in df.collect()}
    # only people with >=1 declared friend can qualify (trap #7 precondition)
    friend_owners = {r.PersonID for r in friends.select("PersonID").distinct().collect()}
    assert ids <= friend_owners
    compare(
        df,
        duck,
        """SELECT f.PersonID, p.Name
           FROM (SELECT DISTINCT fr.PersonID
                 FROM friends fr
                 WHERE NOT EXISTS (
                   SELECT 1 FROM access_logs a
                   WHERE a.ByWho = fr.PersonID AND a.WhatPage = fr.MyFriend)) f
           LEFT JOIN pages p ON f.PersonID = p.PersonID""",
    )


def test_task_g(pages, access_logs, duck):
    df = social.stale_or_disconnected(pages, access_logs)
    rows = {r.PersonID: r.LastAccess for r in df.collect()}
    assert 11 in rows and rows[11] is None  # never-accessed passes (trap #4)
    compare(
        df.withColumn(
            "LastAccess",
            __import__("pyspark.sql.functions", fromlist=["date_format"]).date_format(
                "LastAccess", "yyyy-MM-dd HH:mm:ss"
            ),
        ),
        duck,
        """WITH last AS (SELECT ByWho, MAX(AccessTime) AS la
                         FROM access_logs GROUP BY 1),
                ref AS (SELECT MAX(AccessTime) AS r FROM access_logs)
           SELECT p.PersonID, p.Name,
                  strftime(la, '%Y-%m-%d %H:%M:%S') AS LastAccess
           FROM pages p LEFT JOIN last ON p.PersonID = last.ByWho CROSS JOIN ref
           WHERE la IS NULL OR FLOOR((epoch(r) - epoch(la)) / 86400) >= 14""",
    )


def test_task_h(pages, friends, duck):
    df = social.above_average_connectors(pages, friends)
    rows = {r.PersonID: r.FriendCount for r in df.collect()}
    # SURVEY §5: avg = 40/15 ~= 2.667 over people WITH friends (trap #1);
    # strictly greater (trap #2) -> exactly the 8 people with outdeg >= 3.
    assert rows == {17: 3, 5: 4, 16: 4, 19: 3, 7: 3, 12: 4, 2: 4, 1: 5}


def test_wordcount(corpus, duck):
    df = social.word_count(corpus)
    rows = {r.Word: r.Count for r in df.collect()}
    assert "WPI" in rows
    assert "" not in rows
    total_tokens = sum(rows.values())
    assert total_tokens > 1000
    # punctuation stays attached: 'WPI' and any 'WPI,'-style token differ
    compare(
        df,
        duck,
        """SELECT word AS Word, COUNT(*) AS Count
           FROM (SELECT unnest(regexp_split_to_array(content, '\\s+')) AS word
                 FROM (SELECT string_agg(line, chr(10)) AS content FROM
                       read_csv('/root/reference/data.txt', sep=chr(7),
                                header=false, columns={'line':'VARCHAR'})))
           WHERE word <> '' GROUP BY 1""",
    )
