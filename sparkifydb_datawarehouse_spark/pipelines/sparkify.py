"""The Sparkify ETL replica — literal reference parity.

Re-expresses the reference's two-stage ELT (staging COPY loads +
five INSERT…SELECT transforms, /root/reference/etl.py:10-50 driving
/root/reference/sql_queries.py:102-173) as DataFrame transforms over
reference-shaped JSON fixtures (shapes from
/root/reference/README.md:32-72, generated deterministically below —
see FIXTURES.md §B for the required coverage: non-NextSong pages,
null song/artist/length rows, duplicate userIds, join hits AND
misses, year==0 songs).

Faithfulness notes (SURVEY §7 sharp edges):
- users/artists keep duplicates — the reference's PKs are unenforced
  and its inserts do not dedup (sql_queries.py:133-136,145-155).
- songs.year 0 → NULL via the CASE WHEN (sql_queries.py:141-143).
- time dims use the dow shim (Redshift EXTRACT(dow) 0=Sun..6=Sat vs
  Spark dayofweek 1..7; sql_queries.py:161-167).
- songplays' IDENTITY surrogate key is generated with
  monotonically_increasing_id in `run_pipeline` (non-contiguous under
  parallelism, like Redshift identity under MPP load) but excluded
  from the oracle-checked query output (nondeterministic by design).

Oracles: DuckDB reads the SAME JSON fixture files via read_json, so
every transform (not just row counts) is value-checked.
"""

from __future__ import annotations

import json
import os
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..registry import query
from ..sources.json_mapped import mapping_from_jsonpaths, read_json_mapped

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "data", "sparkify")
FIXTURE_DIR = os.path.abspath(FIXTURE_DIR)
LOG_DIR = os.path.join(FIXTURE_DIR, "log_data")
SONG_DIR = os.path.join(FIXTURE_DIR, "song_data")
# analog of s3://udacity-dend/log_json_path.json (dwh.cfg:13)
JSONPATHS_FILE = os.path.join(FIXTURE_DIR, "log_json_path.json")

# ---------------------------------------------------------------------------
# Deterministic reference-shaped fixture generation (seed fixed; files
# are committed — regeneration is idempotent).
# ---------------------------------------------------------------------------

_BASE_TS = 1541290555796  # from the reference's sample record, README.md:64


def _gen_songs(rng: random.Random, n: int = 12) -> list[dict]:
    songs = []
    for i in range(n):
        songs.append(
            {
                "num_songs": 1,
                "artist_id": f"AR{i:05d}",
                "artist_latitude": round(rng.uniform(-60, 60), 5) if i % 3 else None,
                "artist_longitude": round(rng.uniform(-120, 120), 5) if i % 3 else None,
                "artist_location": f"City {i}",
                "artist_name": f"Artist {i}",
                "song_id": f"SO{i:05d}",
                "title": f"Song Title {i}",
                "duration": round(rng.uniform(90, 400), 5),
                "year": 0 if i % 4 == 0 else 1990 + i,  # year==0 sentinel coverage
            }
        )
    return songs


def _gen_events(
    rng: random.Random,
    songs: list[dict],
    n: int = 300,
    n_users: int = 8,
) -> list[dict]:
    first_names = ["Lily", "Jacob", "Sylvie", "Kate", "Aleena", "Jacqueline"]
    last_names = ["Koch", "Klein", "Cruz", "Harrell", "Kirby", "Lynch"]
    pages = ["NextSong"] * 6 + ["Home", "Login", "Logout", "Downgrade"]
    events = []
    ts = _BASE_TS
    for i in range(n):
        ts += rng.randint(1000, 600_000)
        page = pages[rng.randrange(len(pages))]
        user_idx = rng.randrange(n_users)  # few users → duplicate userIds (A10)
        logged_in = rng.random() > 0.05
        ev = {
            "artist": None,
            "auth": "Logged In" if logged_in else "Logged Out",
            "firstName": first_names[user_idx % len(first_names)] if logged_in else None,
            "gender": "F" if user_idx % 2 else "M",
            "itemInSession": rng.randrange(10),
            "lastName": last_names[user_idx % len(last_names)] if logged_in else None,
            "length": None,
            "level": "paid" if user_idx % 3 == 0 else "free",
            "location": f"Metro {user_idx}",
            "method": "PUT" if page == "NextSong" else "GET",
            "page": page,
            "registration": float(_BASE_TS - rng.randint(10**6, 10**9)),
            "sessionId": 100 + i // 7,
            "song": None,
            "status": 200 if page != "Login" else 307,
            "ts": ts,
            "userAgent": f'"Mozilla/5.0 (agent {user_idx})"',
            "userId": str(10 + user_idx) if logged_in else "",
        }
        if page == "NextSong":
            if rng.random() < 0.5:  # join HIT: exact (title, artist, duration)
                s = songs[rng.randrange(len(songs))]
                ev.update(
                    artist=s["artist_name"], song=s["title"], length=s["duration"]
                )
            else:  # join MISS
                ev.update(
                    artist=f"Unknown Artist {i}",
                    song=f"Unknown Song {i}",
                    length=round(rng.uniform(90, 400), 5),
                )
        events.append(ev)
    return events


def ensure_fixtures() -> None:
    """Generate the JSON-lines fixture files if absent (idempotent,
    deterministic: seed 42)."""
    if not os.path.exists(JSONPATHS_FILE):
        # the events JSONPaths document, byte-shaped like the
        # reference's log_json_path.json: bracket-form top-level paths
        # in staging_events DDL order (sql_queries.py:20-37)
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        with open(JSONPATHS_FILE, "w") as f:
            json.dump(
                {"jsonpaths": [f"$['{key}']" for key in EVENTS_JSON_KEY_ORDER]},
                f,
                indent=4,
            )
    if os.path.exists(os.path.join(LOG_DIR, "events.json")) and os.path.exists(
        os.path.join(SONG_DIR, "songs.json")
    ):
        return
    rng = random.Random(42)
    songs = _gen_songs(rng)
    events = _gen_events(rng, songs)
    os.makedirs(LOG_DIR, exist_ok=True)
    os.makedirs(SONG_DIR, exist_ok=True)
    with open(os.path.join(SONG_DIR, "songs.json"), "w") as f:
        for s in songs:
            f.write(json.dumps(s) + "\n")
    with open(os.path.join(LOG_DIR, "events.json"), "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def generate_scaled_corpus(dst_dir: str, k: int) -> tuple[str, str]:
    """K×-scaled reference-shaped JSON corpus (VERDICT r6 #6): 12·K
    songs, 300·K events over 8·K users, events split across min(K, 32)
    newline-delimited files so the staging scan parallelizes the way a
    many-object S3 prefix would. Deterministic (seed 42); idempotent.
    Returns (log_dir, song_dir)."""
    log_dir = os.path.join(dst_dir, "log_data")
    song_dir = os.path.join(dst_dir, "song_data")
    if os.path.exists(os.path.join(song_dir, "songs.json")) and os.path.exists(
        os.path.join(log_dir, "events-000.json")
    ):
        return log_dir, song_dir
    rng = random.Random(42)
    songs = _gen_songs(rng, n=12 * k)
    events = _gen_events(rng, songs, n=300 * k, n_users=8 * k)
    os.makedirs(log_dir, exist_ok=True)
    os.makedirs(song_dir, exist_ok=True)
    with open(os.path.join(song_dir, "songs.json"), "w") as f:
        for s in songs:
            f.write(json.dumps(s) + "\n")
    n_files = min(k, 32)
    per = (len(events) + n_files - 1) // n_files
    for fi in range(n_files):
        with open(os.path.join(log_dir, f"events-{fi:03d}.json"), "w") as f:
            for e in events[fi * per : (fi + 1) * per]:
                f.write(json.dumps(e) + "\n")
    return log_dir, song_dir


# ---------------------------------------------------------------------------
# Staging schemas + the JSONPaths-style mapping (reference DDL:
# staging_events sql_queries.py:19-38, staging_songs :40-51).
# ---------------------------------------------------------------------------

EVENTS_JSON_SCHEMA = StructType(
    [
        StructField("artist", StringType()),
        StructField("auth", StringType()),
        StructField("firstName", StringType()),
        StructField("gender", StringType()),
        StructField("itemInSession", IntegerType()),
        StructField("lastName", StringType()),
        StructField("length", DoubleType()),
        StructField("level", StringType()),
        StructField("location", StringType()),
        StructField("method", StringType()),
        StructField("page", StringType()),
        StructField("registration", DoubleType()),
        StructField("sessionId", IntegerType()),
        StructField("song", StringType()),
        StructField("status", IntegerType()),
        StructField("ts", LongType()),
        StructField("userAgent", StringType()),
        StructField("userId", StringType()),
    ]
)

# camelCase JSON keys in the order the reference's JSONPaths file
# lists them (mirrors the events record shape, README.md:52-71)
EVENTS_JSON_KEY_ORDER = [
    "artist", "auth", "firstName", "gender", "itemInSession", "lastName",
    "length", "level", "location", "method", "page", "registration",
    "sessionId", "song", "status", "ts", "userAgent", "userId",
]

# staging_events DDL column names in table-definition order
# (sql_queries.py:20-37) — JSONPaths entries map to these by POSITION
EVENTS_STAGING_COLUMNS = [
    "artist", "auth", "first_name", "gender", "item_in_session", "last_name",
    "length", "level", "location", "method", "page", "registration",
    "session_id", "song", "status", "ts", "user_agent", "user_id",
]

# the expected parse result of (JSONPATHS_FILE x EVENTS_STAGING_COLUMNS)
# — kept as a literal so tests can pin the parser's positional
# semantics against it
EVENTS_MAPPING = {  # camelCase JSON key -> snake_case column
    "artist": "artist",
    "auth": "auth",
    "firstName": "first_name",
    "gender": "gender",
    "itemInSession": "item_in_session",
    "lastName": "last_name",
    "length": "length",
    "level": "level",
    "location": "location",
    "method": "method",
    "page": "page",
    "registration": "registration",
    "sessionId": "session_id",
    "song": "song",
    "status": "status",
    "ts": "ts",
    "userAgent": "user_agent",
    "userId": "user_id",
}

SONGS_JSON_SCHEMA = StructType(
    [
        StructField("num_songs", IntegerType()),
        StructField("artist_id", StringType()),
        StructField("artist_latitude", DoubleType()),
        StructField("artist_longitude", DoubleType()),
        StructField("artist_location", StringType()),
        StructField("artist_name", StringType()),
        StructField("song_id", StringType()),
        StructField("title", StringType()),
        StructField("duration", DoubleType()),
        StructField("year", IntegerType()),
    ]
)


# the staging_events DDL's VARCHAR(n) caps (sql_queries.py:22,25,27,29,30)
EVENTS_VARCHAR_CAPS = {
    "first_name": 30,
    "last_name": 30,
    "level": 10,
    "method": 3,
    "page": 30,
}


def load_staging_events(
    spark: SparkSession,
    clamp_varchar: bool = False,
    log_dir: str | None = None,
) -> DataFrame:
    """A1 — JSONPaths-mapped staging load (sql_queries.py:102-107).

    The column mapping is parsed from an actual JSONPaths document
    (JSONPATHS_FILE, the analog of s3://udacity-dend/log_json_path.json)
    positionally against the staging_events DDL column list — the same
    contract Redshift COPY applies. `clamp_varchar` opts into the
    VARCHAR(n) length clamp (see read_json_mapped.varchar_caps for why
    it is off by default)."""
    ensure_fixtures()
    return read_json_mapped(
        spark,
        log_dir or LOG_DIR,
        EVENTS_JSON_SCHEMA,
        mapping=mapping_from_jsonpaths(JSONPATHS_FILE, EVENTS_STAGING_COLUMNS),
        millis_columns=("ts", "registration"),
        varchar_caps=EVENTS_VARCHAR_CAPS if clamp_varchar else None,
    )


def load_staging_songs(
    spark: SparkSession, song_dir: str | None = None
) -> DataFrame:
    """A2 — JSON 'auto' staging load (sql_queries.py:109-114)."""
    ensure_fixtures()
    return read_json_mapped(spark, song_dir or SONG_DIR, SONGS_JSON_SCHEMA)


# ---------------------------------------------------------------------------
# The five INSERT…SELECT transforms (sql_queries.py:118-173).
# ---------------------------------------------------------------------------


def songplays(
    spark: SparkSession, se: DataFrame | None = None, ss: DataFrame | None = None
) -> DataFrame:
    """songplay_table_insert (sql_queries.py:118-131): 3-key join on
    (song=title, artist=artist_name, length=duration) + NextSong filter.
    Surrogate key deliberately excluded here (oracle-checked query);
    run_pipeline adds it at write time and passes cached staging frames
    (the COPY-once analog — the reference loads staging exactly once)."""
    se = load_staging_events(spark) if se is None else se
    ss = load_staging_songs(spark) if ss is None else ss
    return (
        se.join(
            ss,
            (se.song == ss.title)
            & (se.artist == ss.artist_name)
            & (se.length == ss.duration),
            "inner",
        )
        .filter(F.col("page") == "NextSong")
        .select(
            F.col("ts").alias("start_time"),
            F.col("user_id"),
            F.col("level"),
            F.col("song_id"),
            F.col("artist_id"),
            F.col("session_id"),
            F.col("location"),
            F.col("user_agent"),
        )
    )


def users(spark: SparkSession, se: DataFrame | None = None) -> DataFrame:
    """user_table_insert (sql_queries.py:133-136): straight projection,
    duplicates kept (PK unenforced in Redshift — faithful)."""
    se = load_staging_events(spark) if se is None else se
    return se.select(
        F.col("user_id"),
        F.col("first_name"),
        F.col("last_name"),
        F.col("gender"),
        F.col("level"),
    )


def songs_dim(spark: SparkSession, ss: DataFrame | None = None) -> DataFrame:
    """song_table_insert (sql_queries.py:138-143): year 0 → NULL."""
    ss = load_staging_songs(spark) if ss is None else ss
    return ss.select(
        "song_id",
        "title",
        "artist_id",
        F.nullif(F.col("year"), F.lit(0)).alias("year"),
        "duration",
    )


def artists_dim(
    spark: SparkSession, se: DataFrame | None = None, ss: DataFrame | None = None
) -> DataFrame:
    """artist_table_insert (sql_queries.py:145-155): 2-key join
    (title + artist_name, no duration), duplicates kept."""
    se = load_staging_events(spark) if se is None else se
    ss = load_staging_songs(spark) if ss is None else ss
    return (
        se.join(ss, (se.song == ss.title) & (se.artist == ss.artist_name), "inner")
        .filter(F.col("page") == "NextSong")
        .select(
            F.col("artist_id"),
            F.col("artist_name").alias("name"),
            F.col("artist_location").alias("location"),
            F.col("artist_latitude").alias("latitude"),
            F.col("artist_longitude").alias("longitude"),
        )
    )


def time_dim(spark: SparkSession, se: DataFrame | None = None) -> DataFrame:
    """time_table_insert (sql_queries.py:157-173): DISTINCT ts +
    6 dateparts with the dow shim."""
    se = load_staging_events(spark) if se is None else se
    ts = se.filter(F.col("page") == "NextSong").select("ts").distinct()
    return ts.select(
        F.col("ts").alias("start_time"),
        F.hour("ts").cast("long").alias("hour"),
        F.dayofmonth("ts").cast("long").alias("day"),
        F.weekofyear("ts").cast("long").alias("week"),
        F.month("ts").cast("long").alias("month"),
        F.year("ts").cast("long").alias("year"),
        (F.dayofweek("ts") - 1).cast("long").alias("weekday"),
    )


def run_pipeline(
    spark: SparkSession,
    warehouse_dir: str,
    timings: dict[str, float] | None = None,
    log_dir: str | None = None,
    song_dir: str | None = None,
) -> dict[str, int]:
    """A3/A5/A17 — full orchestration: staging loads, five transforms,
    star-schema parquet warehouse. Mirrors etl.py's per-statement
    commit (each table write is an independent action) but raises on
    failure instead of swallowing (SURVEY §3 improvement note).
    Returns per-table row counts; pass `timings` to collect per-stage
    wall seconds the way the reference's etl.py logs per-statement
    (/root/reference/etl.py:22-47) — staging loads are timed as their
    own stages (the COPY analog), each star-table stage covers
    transform + write + count-back."""
    import time as _time

    def _staged(name: str, fn):
        t0 = _time.perf_counter()
        out = fn()
        if timings is not None:
            timings[name] = _time.perf_counter() - t0
        return out

    # COPY analog: load + materialize each staging frame exactly once
    # (localCheckpoint = the staging TABLE the reference's COPY builds;
    # without it every transform re-reads and re-parses the JSON).
    # The checkpointed blocks stay pinned for the session — bounded at
    # two <=300-row frames here, and the CLI/etl_baseline entry points
    # exit right after; registry queries never call run_pipeline.
    se = _staged(
        "copy_staging_events",
        lambda: load_staging_events(spark, log_dir=log_dir).localCheckpoint(
            eager=True
        ),
    )
    ss = _staged(
        "copy_staging_songs",
        lambda: load_staging_songs(spark, song_dir=song_dir).localCheckpoint(
            eager=True
        ),
    )

    tables: dict[str, DataFrame] = {
        "songplays": songplays(spark, se, ss).withColumn(
            "songplay_id", F.monotonically_increasing_id()
        ),
        "users": users(spark, se),
        "songs": songs_dim(spark, ss),
        "artists": artists_dim(spark, se, ss),
        "time": time_dim(spark, se),
    }
    counts = {}
    for name, df in tables.items():  # insert order: sql_queries.py:196-202
        path = os.path.join(warehouse_dir, name)

        def _stage(df=df, path=path, name=name):
            df.write.mode("overwrite").parquet(path)
            counts[name] = spark.read.parquet(path).count()

        _staged(f"insert_{name}", _stage)
    return counts


# ---------------------------------------------------------------------------
# Registry entries. Oracles read the SAME JSON fixtures via DuckDB
# read_json, so transforms are value-checked end to end. The `sf_dir`
# argument is ignored — the sparkify corpus is scale-independent.
# ---------------------------------------------------------------------------

_DUCK_EVENTS = f"""
read_json('{LOG_DIR}/events.json', format='newline_delimited', columns={{
    'artist': 'VARCHAR', 'auth': 'VARCHAR', 'firstName': 'VARCHAR',
    'gender': 'VARCHAR', 'itemInSession': 'INTEGER', 'lastName': 'VARCHAR',
    'length': 'DOUBLE', 'level': 'VARCHAR', 'location': 'VARCHAR',
    'method': 'VARCHAR', 'page': 'VARCHAR', 'registration': 'DOUBLE',
    'sessionId': 'INTEGER', 'song': 'VARCHAR', 'status': 'INTEGER',
    'ts': 'BIGINT', 'userAgent': 'VARCHAR', 'userId': 'VARCHAR'}})
"""

_DUCK_SONGS = f"""
read_json('{SONG_DIR}/songs.json', format='newline_delimited', columns={{
    'num_songs': 'INTEGER', 'artist_id': 'VARCHAR', 'artist_latitude': 'DOUBLE',
    'artist_longitude': 'DOUBLE', 'artist_location': 'VARCHAR',
    'artist_name': 'VARCHAR', 'song_id': 'VARCHAR', 'title': 'VARCHAR',
    'duration': 'DOUBLE', 'year': 'INTEGER'}})
"""

_ORACLE_STAGING_EVENTS = f"""
SELECT artist, auth, firstName AS first_name, gender,
       itemInSession AS item_in_session, lastName AS last_name, length, level,
       location, method, page,
       epoch_ms(CAST(registration AS BIGINT)) AS registration,
       sessionId AS session_id, song, status,
       epoch_ms(ts) AS ts, userAgent AS user_agent, userId AS user_id
FROM {_DUCK_EVENTS}
ORDER BY ts, session_id, item_in_session
"""


@query("q_sparkify_staging_events", oracle=_ORACLE_STAGING_EVENTS)
def q_staging_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_staging_events(spark).orderBy("ts", "session_id", "item_in_session")


_ORACLE_STAGING_SONGS = f"""
SELECT * FROM {_DUCK_SONGS} ORDER BY song_id
"""


@query("q_sparkify_staging_songs", oracle=_ORACLE_STAGING_SONGS)
def q_staging_songs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_staging_songs(spark).orderBy("song_id")


_ORACLE_SONGPLAYS = f"""
SELECT epoch_ms(se.ts) AS start_time,
       se.userId AS user_id,
       se.level AS level,
       ss.song_id AS song_id,
       ss.artist_id AS artist_id,
       se.sessionId AS session_id,
       se.location AS location,
       se.userAgent AS user_agent
FROM {_DUCK_EVENTS} se
JOIN {_DUCK_SONGS} ss
  ON se.song = ss.title AND se.artist = ss.artist_name AND se.length = ss.duration
WHERE se.page = 'NextSong'
ORDER BY start_time, session_id
"""


@query("q_sparkify_songplays", oracle=_ORACLE_SONGPLAYS)
def q_songplays(spark: SparkSession, sf_dir: str) -> DataFrame:
    return songplays(spark).orderBy("start_time", "session_id")


_ORACLE_USERS = f"""
SELECT userId AS user_id, firstName AS first_name, lastName AS last_name,
       gender, level
FROM {_DUCK_EVENTS}
ORDER BY user_id, first_name, last_name, gender, level
"""


@query("q_sparkify_users", oracle=_ORACLE_USERS)
def q_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return users(spark).orderBy("user_id", "first_name", "last_name", "gender", "level")


_ORACLE_SONGS = f"""
SELECT song_id, title, artist_id, NULLIF(year, 0) AS year, duration
FROM {_DUCK_SONGS}
ORDER BY song_id
"""


@query("q_sparkify_songs", oracle=_ORACLE_SONGS)
def q_songs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return songs_dim(spark).orderBy("song_id")


_ORACLE_ARTISTS = f"""
SELECT ss.artist_id AS artist_id,
       ss.artist_name AS name,
       ss.artist_location AS location,
       ss.artist_latitude AS latitude,
       ss.artist_longitude AS longitude
FROM {_DUCK_EVENTS} se
JOIN {_DUCK_SONGS} ss
  ON se.song = ss.title AND se.artist = ss.artist_name
WHERE se.page = 'NextSong'
ORDER BY artist_id, name
"""


@query("q_sparkify_artists", oracle=_ORACLE_ARTISTS)
def q_artists(spark: SparkSession, sf_dir: str) -> DataFrame:
    return artists_dim(spark).orderBy("artist_id", "name")


_ORACLE_TIME = f"""
SELECT epoch_ms(ts) AS start_time,
       EXTRACT(hour FROM epoch_ms(ts)) AS hour,
       EXTRACT(day FROM epoch_ms(ts)) AS day,
       weekofyear(epoch_ms(ts)) AS week,
       EXTRACT(month FROM epoch_ms(ts)) AS month,
       EXTRACT(year FROM epoch_ms(ts)) AS year,
       dayofweek(epoch_ms(ts)) AS weekday
FROM (SELECT DISTINCT ts FROM {_DUCK_EVENTS} WHERE page = 'NextSong')
ORDER BY start_time
"""


@query("q_sparkify_time", oracle=_ORACLE_TIME)
def q_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    return time_dim(spark).orderBy("start_time")
