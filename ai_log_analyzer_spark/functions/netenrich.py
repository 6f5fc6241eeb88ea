"""Network-dimension enrichment for log/telemetry pipelines: GeoIP-style
longest-prefix CIDR lookup as pure relational ops.

The classic log-enrich step — map a client IP to the most specific
matching CIDR block (ASN / geo / datacenter dimension) — is a
longest-prefix match, which naive engines do per-row against a trie.
On Spark the bounded prefix-length universe turns it relational: one
BROADCAST equi-join per distinct prefix length on the masked network
key, then COALESCE in specificity order.  With the standard /24, /16,
/8 grid that is three map-side joins and zero shuffles of the event
stream — the plan a 10¹²-row table wants (each join is
whole-stage-codegen'd; the dim sides are KB-sized).

The block table here is FROZEN and deterministic (hash-derived
labels over fixed network ranges) so the DuckDB oracle can embed the
identical literal dimension; a production pipeline would load the
MaxMind/ASN export into the same (plen, net, label) shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import hash32

# frozen CIDR dimension: (prefix_len, network_int, label).  Specific
# /24s inside 10.1.1.0, /16s inside 10.x, /8s for a few top octets —
# nested on purpose so longest-prefix precedence is actually exercised.
CIDR_BLOCKS: tuple[tuple[int, int, str], ...] = tuple(
    [(24, (10 << 24) | (1 << 16) | (b << 8), f"dc-{b}") for b in range(8)]
    + [(16, (10 << 24) | (s << 16), f"region-{s}") for s in range(4)]
    + [(8, o << 24, f"net-{o}") for o in (10, 172, 192)]
)


def ip_from_key(key_col) -> F.Column:
    """Deterministic synthetic IPv4 (as uint32-in-long) for a key.
    A 4-way zone selector steers keys into the /24 grid (10.1.0-7.x),
    the /16 grid (10.0-3.x.x), the bare /8s (10/172/192), or an
    unmatched 8.x.x.x slice, so every precedence depth of the frozen
    dimension is exercised at any corpus size (integer-only so the
    DuckDB mirror in :func:`_ip_sql` is bit-identical)."""
    sel = F.pmod(hash32(key_col.cast("string")), F.lit(16))
    lo = F.pmod(hash32(F.concat(key_col.cast("string"), F.lit("|ip-lo"))),
                F.lit(1 << 24)).cast("long")
    top8 = F.element_at(F.array(F.lit(10), F.lit(172), F.lit(192)),
                        (F.pmod(lo, F.lit(3)) + 1).cast("int")).cast("long")
    def idiv(c, d):
        return F.floor(c / F.lit(d)).cast("long")
    return (F.when(sel < 4,
                   F.lit((10 << 24) + (1 << 16))
                   + F.pmod(lo, F.lit(8)) * 256
                   + F.pmod(idiv(lo, 8), F.lit(256)))
            .when(sel < 8,
                  F.lit(10 << 24) + F.pmod(lo, F.lit(4)) * 65536
                  + F.pmod(idiv(lo, 4), F.lit(65536)))
            .when(sel < 12,
                  top8 * (1 << 24) + F.pmod(idiv(lo, 3), F.lit(1 << 24)))
            .otherwise(F.lit(8 << 24) + lo)).cast("long")


def cidr_enrich_stats(events: DataFrame, key_col: str = "user_id",
                      id_col: str = "event_id",
                      ip_col: str | None = None) -> DataFrame:
    """(block_label, prefix_len, n_events, n_keys) — longest-prefix
    CIDR enrichment of the event stream, aggregated per matched block
    ('unmatched'/0 row collects the rest).  ``ip_col`` supplies a real
    uint32-in-long IP column; when absent the deterministic synthetic
    :func:`ip_from_key` projection stands in (tests/bench).

    Scale shape: the event side is ONE codegen projection (ip + the
    three masked network keys) followed by three BROADCAST joins (the
    dimension is KB-sized at any realistic block count) and COALESCE
    in /24 → /16 → /8 order — the event stream never shuffles until
    the final small groupBy(label).  n_keys is countDistinct over the
    key — the only agg needing a distinct shuffle, keyed on the
    bounded label universe."""
    spark = events.sparkSession
    dims = {}
    for plen in (24, 16, 8):
        rows = [(net, lbl) for p, net, lbl in CIDR_BLOCKS if p == plen]
        dims[plen] = F.broadcast(spark.createDataFrame(
            rows, f"net{plen} long, label{plen} string"))
    ip = F.col(ip_col).cast("long") if ip_col else ip_from_key(F.col(key_col))
    ev = events.select(F.col(id_col).alias("_eid"),
                       F.col(key_col).alias("_key"),
                       ip.alias("_ip"))
    for plen in (24, 16, 8):
        ev = ev.withColumn(f"net{plen}",
                           F.expr(f"_ip div {1 << (32 - plen)}")
                           * F.lit(1 << (32 - plen)))
        ev = ev.join(dims[plen], f"net{plen}", "left")
    lbl = F.coalesce("label24", "label16", "label8", F.lit("unmatched"))
    pl = (F.when(F.col("label24").isNotNull(), 24)
          .when(F.col("label16").isNotNull(), 16)
          .when(F.col("label8").isNotNull(), 8)
          .otherwise(0)).cast("int")
    return (ev.select(lbl.alias("block_label"), pl.alias("prefix_len"),
                      "_key")
            .groupBy("block_label", "prefix_len")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.countDistinct("_key").cast("long").alias("n_keys")))


def _ip_sql(key_expr: str) -> str:
    from .hashing import hash32_sql
    lo_arg = key_expr + "::VARCHAR || '|ip-lo'"
    sel = f"(({hash32_sql(key_expr + '::VARCHAR')}) % 16)"
    lo = f"(({hash32_sql(lo_arg)}) % {1 << 24})"
    return f"""(CASE
      WHEN {sel} < 4 THEN {(10 << 24) + (1 << 16)}
           + ({lo} % 8) * 256 + ({lo} // 8) % 256
      WHEN {sel} < 8 THEN {10 << 24}
           + ({lo} % 4) * 65536 + ({lo} // 4) % 65536
      WHEN {sel} < 12 THEN [10, 172, 192][({lo} % 3) + 1]::BIGINT * {1 << 24}
           + ({lo} // 3) % {1 << 24}
      ELSE {8 << 24} + {lo} END)"""


def cidr_enrich_sql(events: str, key_expr: str = "user_id",
                    id_expr: str = "event_id") -> str:
    """DuckDB oracle: identical frozen dimension as VALUES literals,
    identical three-join + coalesce precedence; final relation
    ``cidr_out``."""
    def vals(plen):
        rows = ", ".join(f"({net}, '{lbl}')"
                         for p, net, lbl in CIDR_BLOCKS if p == plen)
        return (f"cidr_d{plen}(net{plen}, label{plen}) AS (VALUES {rows})")
    masks = ",\n         ".join(
        f"(ip // {1 << (32 - p)}) * {1 << (32 - p)} AS net{p}"
        for p in (24, 16, 8))
    return f"""
{vals(24)}, {vals(16)}, {vals(8)},
cidr_ev AS (
  SELECT {id_expr} AS _eid, {key_expr} AS _key,
         {masks}
  FROM (SELECT {id_expr}, {key_expr}, {_ip_sql(key_expr)} AS ip
        FROM {events})),
cidr_out AS (
  SELECT coalesce(d24.label24, d16.label16, d8.label8, 'unmatched')
           AS block_label,
         (CASE WHEN d24.label24 IS NOT NULL THEN 24
               WHEN d16.label16 IS NOT NULL THEN 16
               WHEN d8.label8 IS NOT NULL THEN 8 ELSE 0 END)::INT
           AS prefix_len,
         count(*)::BIGINT AS n_events,
         count(DISTINCT _key)::BIGINT AS n_keys
  FROM cidr_ev e
  LEFT JOIN cidr_d24 d24 ON e.net24 = d24.net24
  LEFT JOIN cidr_d16 d16 ON e.net16 = d16.net16
  LEFT JOIN cidr_d8  d8  ON e.net8  = d8.net8
  GROUP BY 1, 2)"""
