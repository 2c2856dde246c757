"""Golden medallion-pipeline tests on domain-shaped dirty fixtures
(FIXTURES.md B1-B4): planted dirty nulls, duplicates, invalid rows, and
late arrivals; assertions on counts, id density, dedup idempotence, and
the reference's semantic gotchas (SURVEY.md §7.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_v3_spark.pipelines import coin, news, stocks, uber


# ---------------------------------------------------------------------------
# B1: uber bookings
# ---------------------------------------------------------------------------

def _uber_raw(spark):
    cols = [
        "Date", "Time", "Booking ID", "Booking Status", "Vehicle Type",
        "Avg VTAT", "Booking Value", "Ride Distance", "Payment Method",
        "Reason for cancelling by Customer", "Driver Cancellation Reason",
        "Incomplete Rides Reason",
    ]
    rows = [
        ("2024-05-01", "08:30:00", "GEN-001", "Completed", "Sedan", "4.5", "250.0", "10.0", "UPI", None, None, None),
        ("2024-05-01", "13:15:00", "GEN-002", "Completed", "Bike", "null", "80.0", "4.0", "Cash", None, None, None),
        ("2024-05-01", "19:45:00", "GEN-003", "Cancelled by Customer", "Sedan", "3.0", None, "6.0", None, None, None, None),
        ("2024-05-02", "02:10:00", "GEN-004", "No Driver Found", "Auto", "", None, "3.0", None, None, None, None),
        ("2024-05-02", "16:00:00", "GEN-005", "Cancelled by Driver", "Bike", "5.5", None, "2.0", "Cash", None, "Too far", None),
        ("2024-05-02", "16:00:00", "GEN-005", "Cancelled by Driver", "Bike", "5.5", None, "2.0", "Cash", None, "Too far", None),  # exact dup
        ("2024-05-02", "23:55:00", "GEN-006", "Incomplete", "Sedan", "nan", None, "8.0", "UPI", None, None, None),
    ]
    return spark.createDataFrame(rows, ", ".join(f"`{c}` string" for c in cols))


def test_uber_bronze2_clean_and_ids(spark):
    b2 = uber.bronze2(_uber_raw(spark))
    assert "Booking_ID" in b2.columns and "Avg_VTAT" in b2.columns
    # dirty strings became typed NULLs
    vals = {r.Booking_ID: r.Avg_VTAT for r in b2.collect()}
    assert vals["GEN-002"] is None and vals["GEN-004"] is None and vals["GEN-006"] is None
    assert vals["GEN-001"] == 4.5
    # lineage columns front + dense ids over 7 raw rows
    assert b2.columns[0] == "cd_bronze_id"
    assert sorted(r.cd_bronze_id for r in b2.collect()) == list(range(1, 8))


def test_uber_silver_dedup_impute_features(spark):
    sv = uber.silver(uber.bronze2(_uber_raw(spark)))
    rows = {r.Booking_ID: r for r in sv.collect()}
    assert len(rows) == 6  # exact dup dropped
    # dense silver ids 1..6
    assert sorted(r.cd_silver_id for r in sv.collect()) == list(range(1, 7))
    # mean imputation: observed VTATs {4.5, 3.0, 5.5} → mean 13/3
    assert abs(rows["GEN-002"].Avg_VTAT - 13.0 / 3) < 1e-9
    # mode imputation: Cash(2) vs UPI(2) → tie broken by value asc = Cash
    assert rows["GEN-003"].Payment_Method == "Cash"
    # constant imputation
    assert rows["GEN-001"].Driver_Cancellation_Reason == "Reason Unknown"
    # time features: 08:30 Morning+rush, 19:45 Evenings, 02:10 LateNights,
    # 16:00 Afternoon+rush
    assert (rows["GEN-001"].TimeZone, rows["GEN-001"].RushHour) == ("Morning", 1)
    assert (rows["GEN-003"].TimeZone, rows["GEN-003"].RushHour) == ("Evenings", 0)
    assert (rows["GEN-004"].TimeZone, rows["GEN-004"].RushHour) == ("LateNights", 0)
    assert (rows["GEN-005"].TimeZone, rows["GEN-005"].RushHour) == ("Afternoon", 1)


def test_uber_gold_semantics(spark):
    sv = uber.silver(uber.bronze2(_uber_raw(spark)))
    booking = {(r.Date, r.Vehicle_Type): r for r in uber.gold_booking_stats(sv).collect()}
    # 2024-05-01 Sedan: GEN-001 Completed (250) + GEN-003 Cancelled →
    # revenue only from Completed; Cancelled_Rides counts the non-Completed
    r = booking[("2024-05-01", "Sedan")]
    assert r.Total_Bookings == 2 and r.Completed_Bookings == 1
    assert r.Cancelled_Rides == 1 and r.Total_Revenue == 250.0
    # No Driver Found + Incomplete count as cancelled (SURVEY §7.4)
    r2 = booking[("2024-05-02", "Auto")]
    assert r2.Cancelled_Rides == 1 and r2.Total_Revenue == 0.0

    cancels = uber.gold_cancellation_stats(sv).collect()
    types = {r.Cancellation_Type for r in cancels}
    assert types == {"Customer", "Driver", "No Driver", "Incomplete"}
    pay = {(r.Month, r.Payment_Method): r.Bookings for r in uber.gold_payment_stats(sv).collect()}
    assert pay[("2024-05", "Cash")] == 4  # GEN-002, GEN-005 + imputed GEN-003/004


# ---------------------------------------------------------------------------
# B2: coin listings (nested, latest-per-key, incremental)
# ---------------------------------------------------------------------------

def _coin_bronze(spark, ts, ids_prices, first_id=1):
    rows = [
        (cid, f"  Coin{cid}  ", ["defi", "layer1"], {"usd": {"price": price}}, bid, ts)
        for bid, (cid, price) in enumerate(ids_prices, start=first_id)
    ]
    schema = (
        "id long, name string, tags array<string>, "
        "quote struct<usd: struct<price: double>>, cd_bronze_id long, "
        "dt_record_to_bronze2 timestamp"
    )
    return spark.createDataFrame(rows, schema)


def test_coin_silver_flatten_dedup_incremental(spark):
    import datetime

    t1 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    t2 = datetime.datetime(2024, 1, 2, 0, 0, 0)
    b1 = _coin_bronze(spark, t1, [(1, 100.0), (2, 200.0), (1, 101.0)])
    s1 = coin.silver(b1, None)
    rows = {r.id: r for r in s1.collect()}
    assert len(rows) == 2  # latest-per-key: id=1 keeps the newest bronze row
    assert rows[1].quote_usd_price == 101.0  # flattened nested name
    assert rows[1].name == "Coin1"  # trimmed
    assert rows[1].tags == "defi,layer1"  # array flattened
    assert sorted(r.cd_silver_id for r in s1.collect()) == [1, 2]

    # incremental: older/equal-ts rows are skipped, newer processed,
    # silver ids continue
    b2 = _coin_bronze(spark, t2, [(2, 205.0), (3, 300.0)], first_id=10).unionByName(
        _coin_bronze(spark, t1, [(4, 400.0)], first_id=20)  # stale ts → skipped
    )
    s2_increment = coin.silver(b2, s1)
    inc = {r.id: r for r in s2_increment.collect()}
    assert set(inc) == {2, 3}
    assert sorted(r.cd_silver_id for r in s2_increment.collect()) == [3, 4]


# ---------------------------------------------------------------------------
# B3: stocks OHLCV (validity, avg_price, watermark, merge)
# ---------------------------------------------------------------------------

def _stock_raw(spark, rows):
    return spark.createDataFrame(
        rows,
        "timestamp string, open double, high double, low double, close double, "
        "volume long, symbol string, date_ny string, interval string, tz string",
    )


def test_stocks_validity_and_merge(spark):
    raw = _stock_raw(spark, [
        ("2024-03-01T10:00:00.000", 10.0, 12.0, 9.0, 11.0, 1000, "AAPL", "x", "1min", "NY"),
        ("2024-03-01T10:01:00.000", -1.0, 12.0, 9.0, 11.0, 1000, "AAPL", "x", "1min", "NY"),  # open<=0
        ("2024-03-01T10:02:00.000", 10.0, 8.0, 9.0, 11.0, 1000, "AAPL", "x", "1min", "NY"),   # high<low
        ("2024-03-01T10:03:00.000", 10.0, 12.0, 9.0, 11.0, -5, "AAPL", "x", "1min", "NY"),    # vol<0
    ])
    b2 = stocks.bronze2(raw)
    assert "date_ny" not in b2.columns and "ts" in b2.columns
    inc = stocks.silver_increment(b2, None)
    rows = inc.collect()
    assert len(rows) == 1  # three planted violations filtered
    assert rows[0].avg_price == 10.5  # (12+9)/2

    silver1 = stocks.upsert_silver(None, inc)
    # late revision of the same bar + one new bar
    raw2 = _stock_raw(spark, [
        ("2024-03-01T10:00:00.000", 10.0, 13.0, 9.0, 12.0, 1100, "AAPL", "x", "1min", "NY"),
        ("2024-03-01T10:05:00.000", 11.0, 14.0, 10.0, 13.0, 900, "AAPL", "x", "1min", "NY"),
    ])
    revised = stocks.enrich(stocks.validate_ohlcv(stocks.bronze2(raw2)))
    merged = stocks.upsert_silver(silver1, revised)
    out = {str(r.ts): r for r in merged.collect()}
    assert len(out) == 2
    assert out["2024-03-01 10:00:00"].close == 12.0  # updated in place
    assert out["2024-03-01 10:05:00"].close == 13.0  # inserted

    # per-symbol watermark drops not-newer bars
    inc2 = stocks.silver_increment(stocks.bronze2(raw2), silver1)
    assert [str(r.ts) for r in inc2.collect()] == ["2024-03-01 10:05:00"]


# ---------------------------------------------------------------------------
# B4: news articles (two-stage dedup, stable ids, sentiment)
# ---------------------------------------------------------------------------

def _news_bronze(spark, rows):
    return spark.createDataFrame(
        rows,
        "source struct<id: string, name: string>, title string, url string, "
        "content string, publishedAt string, symbol string, "
        "dt_record_to_bronze2 timestamp",
    )


def test_news_dedup_ids_sentiment(spark):
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    src = ("s1", "Reuters")
    b1 = _news_bronze(spark, [
        (src, "A fast big day", "https://x.com/a", "fast big merge fast", "2024-01-01T05:00:00", "AAPL", t0),
        (src, "A v2\r\nrevised", "https://x.com/a", "fast big merge new", "2024-01-01T08:00:00", "AAPL", t0),  # same url, newer
        (src, "Dup by case", "HTTPS://X.com/a".lower(), "irrelevant", "2024-01-01T01:00:00", "AAPL", t0),      # dup article_id
        (src, "Slow dup woes", "https://x.com/b", "slow dup error slow", "2024-01-01T06:00:00", "MSFT", t0),
        (src, "Neutral", "https://x.com/c", "table scan column row", "2024-01-01T07:00:00", "MSFT", t0),
    ])
    norm = news.normalize(b1)
    assert "source_name" in norm.columns
    deduped = news.two_stage_dedup(norm)
    assert deduped.count() == 3  # a (latest), b, c
    title_a = deduped.filter(F.col("url") == "https://x.com/a").collect()[0].title
    assert title_a == "A v2 revised"  # \r\n stripped, newest published_at wins

    silver1 = news.upsert_with_stable_ids(None, deduped)
    ids1 = {r.url: r.cd_silver_id for r in silver1.collect()}
    assert sorted(ids1.values()) == [1, 2, 3]

    # second batch: revision of /a (id must be stable) + new article /d
    b2 = _news_bronze(spark, [
        (src, "A v3", "https://x.com/a", "fast big new merge big", "2024-01-02T05:00:00", "AAPL", t0),
        (src, "Fresh", "https://x.com/d", "fast fast big", "2024-01-02T06:00:00", "GOOG", t0),
    ])
    inc2 = news.two_stage_dedup(news.normalize(b2))
    silver2 = news.upsert_with_stable_ids(silver1, inc2)
    rows2 = {r.url: r for r in silver2.collect()}
    assert len(rows2) == 4
    assert rows2["https://x.com/a"].cd_silver_id == ids1["https://x.com/a"]  # id reuse
    assert rows2["https://x.com/a"].title == "A v3"  # content updated
    assert rows2["https://x.com/d"].cd_silver_id == 4  # continues after max

    gold = news.sentiment_gold(silver2)
    labels = {r.article_id: r.sentiment_label for r in gold.collect()}
    by_url = {r.url: r.article_id for r in silver2.collect()}
    assert labels[by_url["https://x.com/d"]] == "positive"   # all-positive text
    assert labels[by_url["https://x.com/b"]] == "negative"   # slow/dup/error
    assert labels[by_url["https://x.com/c"]] == "neutral"    # no lexicon hits
