"""Medallion pipeline compositions (bronze → silver → gold) mirroring
the reference's four data domains:

  uber.py   — ride bookings: CSV ingest, cleaning, imputation, feature
              derivation, 4 gold KPI tables
  coin.py   — nested listings: name sanitation, tags flatten,
              latest-per-key dedup, max-ts incremental
  stocks.py — OHLCV bars: validity filter, avg_price, per-key watermark,
              MERGE upsert
  news.py   — articles: normalization, sha2 ids, two-stage dedup,
              id-preserving upsert, sentiment gold

Each stage is a pure DataFrame→DataFrame function so pipelines compose
with any storage (TableManager) and run identically in batch or inside
foreachBatch micro-batches.
"""
