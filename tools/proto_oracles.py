#!/usr/bin/env python3
"""Prototype round-2 oracle SQL against sf0.01 before freezing it in Scala."""
import duckdb, math, sys

con = duckdb.connect()
for t in ["events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS FROM '/root/testdata/sf0.01/{t}.parquet'")

PRELUDE = """
ticks AS (
  SELECT event_type AS pair, ts AS time, value AS bid,
         value + 0.01 AS ask, event_id AS seq
  FROM events
  WHERE value > 0 AND value + 0.01 > 0 AND value <= value + 0.01
),
dedup AS (
  SELECT pair, date_trunc('second', time) AS time, bid, ask FROM (
    SELECT pair, time, bid, ask,
           row_number() OVER (
             PARTITION BY pair, date_trunc('second', time)
             ORDER BY epoch_us(time), seq) AS rn
    FROM ticks) t
  WHERE rn = 1
),
c1m AS (
  SELECT pair, date_trunc('minute', time) AS time,
         min_by(bid, time) AS open, max(bid) AS high,
         min(bid) AS low, max_by(bid, time) AS close
  FROM dedup GROUP BY 1, 2
)
"""

# ---- 1. EMA recursive CTE (period 14) ----
P = 14
ema_sql = f"""
WITH RECURSIVE {PRELUDE},
c AS (SELECT pair, time, close, row_number() OVER (PARTITION BY pair ORDER BY time) AS rn FROM c1m),
r AS (
  SELECT pair, rn, time, close,
         close AS seed_sum, CAST(NULL AS DOUBLE) AS prev
  FROM c WHERE rn = 1
  UNION ALL
  SELECT c.pair, c.rn, c.time, c.close,
         CASE WHEN c.rn < {P} THEN r.seed_sum + c.close ELSE 0.0 END,
         CASE WHEN c.rn < {P} THEN NULL
              WHEN c.rn = {P} THEN (r.seed_sum + c.close) / {P}
              ELSE (c.close - r.prev) * (2.0 / {P + 1}) + r.prev END
  FROM r JOIN c ON c.pair = r.pair AND c.rn = r.rn + 1
)
SELECT pair, epoch(time)::BIGINT AS time_s, round(prev, 6) AS value FROM r
"""
df = con.sql(ema_sql).df().sort_values(["pair", "time_s"]).reset_index(drop=True)

# python fold replicating the Scala ema
c1m = con.sql(f"WITH {PRELUDE} SELECT pair, epoch(time)::BIGINT t, close FROM c1m ORDER BY pair, t").fetchall()
series = {}
for p_, t_, cl in c1m:
    series.setdefault(p_, []).append((t_, cl))
exp = {}
k = 2.0 / (P + 1)
for p_, rows in series.items():
    seed = 0.0; prev = 0.0
    for i, (t_, cl) in enumerate(rows):
        if i < P - 1: seed += cl; v = None
        elif i == P - 1: prev = (seed + cl) / P; v = prev
        else: prev = (cl - prev) * k + prev; v = prev
        exp[(p_, t_)] = None if v is None else round(v, 6)
bad = 0
for _, row in df.iterrows():
    e = exp[(row["pair"], row["time_s"])]
    g = None if row["value"] != row["value"] else row["value"]  # NaN -> None
    if (e is None) != (g is None) or (e is not None and e != g):
        bad += 1
        if bad < 5: print("EMA mismatch", row["pair"], row["time_s"], g, e)
print(f"EMA: {len(df)} rows, {bad} mismatches")

# ---- 2. RSI recursive CTE ----
rsi_sql = f"""
WITH RECURSIVE {PRELUDE},
c AS (SELECT pair, time, close, row_number() OVER (PARTITION BY pair ORDER BY time) AS rn FROM c1m),
r AS (
  SELECT pair, rn, time, close AS prev_close,
         CAST(0.0 AS DOUBLE) AS avg_gain, CAST(0.0 AS DOUBLE) AS avg_loss, CAST(NULL AS DOUBLE) AS rsi
  FROM c WHERE rn = 1
  UNION ALL
  SELECT c.pair, c.rn, c.time, c.close,
         CASE WHEN c.rn <= {P} THEN r.avg_gain + greatest(c.close - r.prev_close, 0.0)
              WHEN c.rn = {P + 1} THEN (r.avg_gain + greatest(c.close - r.prev_close, 0.0)) / {P}
              ELSE (r.avg_gain * {P - 1} + greatest(c.close - r.prev_close, 0.0)) / {P} END,
         CASE WHEN c.rn <= {P} THEN r.avg_loss + greatest(r.prev_close - c.close, 0.0)
              WHEN c.rn = {P + 1} THEN (r.avg_loss + greatest(r.prev_close - c.close, 0.0)) / {P}
              ELSE (r.avg_loss * {P - 1} + greatest(r.prev_close - c.close, 0.0)) / {P} END,
         NULL
  FROM r JOIN c ON c.pair = r.pair AND c.rn = r.rn + 1
)
SELECT pair, epoch(time)::BIGINT AS time_s, rn,
       CASE WHEN rn > {P} THEN
         CASE WHEN avg_gain + avg_loss = 0.0 THEN 0.0
              ELSE round(100.0 * avg_gain / (avg_gain + avg_loss), 6) END END AS value
FROM r
"""
# NOTE: the avg at rn=P+1 must be seeded: scala does at i==period: avgGain=(sum+gain)/period.
# In CTE above rn is 1-based so i = rn-1; i==P -> rn==P+1. Wait scala: i<period accumulates (i from 1..P-1 after i==0 skip); at i==period... re-check below.
df2 = con.sql(rsi_sql).df()
# python fold replicating Scala rsi
exp2 = {}
for p_, rows in series.items():
    prevClose = 0.0; ag = 0.0; al = 0.0
    for i, (t_, cl) in enumerate(rows):
        v = None
        if i > 0:
            diff = cl - prevClose
            gain = max(diff, 0.0); loss = max(-diff, 0.0)
            if i < P: ag += gain; al += loss
            else:
                if i == P: ag = (ag + gain) / P; al = (al + loss) / P
                else: ag = (ag * (P - 1) + gain) / P; al = (al * (P - 1) + loss) / P
                den = ag + al
                v = 0.0 if den == 0.0 else 100.0 * ag / den
        prevClose = cl
        exp2[(p_, t_)] = None if v is None else round(v, 6)
bad2 = 0
for _, row in df2.iterrows():
    e = exp2[(row["pair"], row["time_s"])]
    g = None if row["value"] != row["value"] else row["value"]
    if (e is None) != (g is None) or (e is not None and e != g):
        bad2 += 1
        if bad2 < 5: print("RSI mismatch rn", row["rn"], row["pair"], row["time_s"], g, e)
print(f"RSI: {len(df2)} rows, {bad2} mismatches")

# ---- 3. signal alternation + window-based backtest ----
alt = con.sql(f"""
WITH {PRELUDE},
sma AS (
  SELECT pair, time,
         CASE WHEN row_number() OVER (PARTITION BY pair ORDER BY time) >= 14
              THEN avg(close) OVER (PARTITION BY pair ORDER BY time ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) END AS s14,
         CASE WHEN row_number() OVER (PARTITION BY pair ORDER BY time) >= 28
              THEN avg(close) OVER (PARTITION BY pair ORDER BY time ROWS BETWEEN 27 PRECEDING AND CURRENT ROW) END AS s28
  FROM c1m),
x AS (SELECT pair, time, s14, s28,
             lag(s14) OVER (PARTITION BY pair ORDER BY time) AS ps,
             lag(s28) OVER (PARTITION BY pair ORDER BY time) AS pl FROM sma),
ev AS (
  SELECT pair, time, 'BUY' AS et, s14 AS price FROM x WHERE ps <= pl AND s14 > s28
  UNION ALL
  SELECT pair, time, 'SELL', s14 FROM x WHERE ps >= pl AND s14 < s28)
SELECT pair, et, lag(et) OVER (PARTITION BY pair ORDER BY time) AS prev_et, count(*) OVER () n
FROM ev QUALIFY et = prev_et
""").df()
print(f"alternation violations: {len(alt)}")

bt = con.sql(f"""
WITH {PRELUDE},
sma AS (
  SELECT pair, time,
         CASE WHEN row_number() OVER (PARTITION BY pair ORDER BY time) >= 14
              THEN avg(close) OVER (PARTITION BY pair ORDER BY time ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) END AS s14,
         CASE WHEN row_number() OVER (PARTITION BY pair ORDER BY time) >= 28
              THEN avg(close) OVER (PARTITION BY pair ORDER BY time ROWS BETWEEN 27 PRECEDING AND CURRENT ROW) END AS s28
  FROM c1m),
x AS (SELECT pair, time, s14, s28,
             lag(s14) OVER (PARTITION BY pair ORDER BY time) AS ps,
             lag(s28) OVER (PARTITION BY pair ORDER BY time) AS pl FROM sma),
ev AS (
  SELECT pair, time, 'BUY' AS et, s14 AS price FROM x WHERE ps <= pl AND s14 > s28
  UNION ALL
  SELECT pair, time, 'SELL', s14 FROM x WHERE ps >= pl AND s14 < s28),
fb AS (SELECT pair, min(time) FILTER (et = 'BUY') AS fbt FROM ev GROUP BY pair),
kept AS (SELECT ev.*, last_value(et) OVER (PARTITION BY ev.pair ORDER BY time
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_et
         FROM ev JOIN fb USING (pair) WHERE ev.time >= fb.fbt)
SELECT pair,
       count(*) FILTER (et = 'SELL')::INT AS trades,
       round(sum(CASE WHEN et = 'SELL' THEN price ELSE -price END)
             + CASE WHEN any_value(last_et) = 'BUY' THEN max_by(price, time) ELSE 0 END, 6) AS total_pnl,
       any_value(last_et) = 'BUY' AS open_position
FROM kept GROUP BY pair ORDER BY pair
""").df()
print(bt)
# python fold
evs = con.sql(f"""
WITH {PRELUDE},
sma AS (
  SELECT pair, time,
         CASE WHEN row_number() OVER (PARTITION BY pair ORDER BY time) >= 14
              THEN avg(close) OVER (PARTITION BY pair ORDER BY time ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) END AS s14,
         CASE WHEN row_number() OVER (PARTITION BY pair ORDER BY time) >= 28
              THEN avg(close) OVER (PARTITION BY pair ORDER BY time ROWS BETWEEN 27 PRECEDING AND CURRENT ROW) END AS s28
  FROM c1m),
x AS (SELECT pair, time, s14, s28,
             lag(s14) OVER (PARTITION BY pair ORDER BY time) AS ps,
             lag(s28) OVER (PARTITION BY pair ORDER BY time) AS pl FROM sma),
ev AS (
  SELECT pair, time, 'BUY' AS et, s14 AS price FROM x WHERE ps <= pl AND s14 > s28
  UNION ALL
  SELECT pair, time, 'SELL', s14 FROM x WHERE ps >= pl AND s14 < s28)
SELECT pair, et, price FROM ev ORDER BY pair, time, et
""").fetchall()
from collections import defaultdict
st = defaultdict(lambda: [0.0, False, 0, 0.0])  # entry, long, trades, pnl
for p_, et, pr in evs:
    s = st[p_]
    if et == "BUY" and not s[1]: s[0] = pr; s[1] = True
    elif et == "SELL" and s[1]: s[3] += pr - s[0]; s[2] += 1; s[1] = False
for _, row in bt.iterrows():
    s = st[row["pair"]]
    ok = s[2] == row["trades"] and round(s[3], 6) == row["total_pnl"] and s[1] == row["open_position"]
    if not ok: print("BT mismatch", row["pair"], s, dict(row))
print("backtest window-oracle check done")

# ---- 4. SimHash hamming for planted near-dup pairs ----
sim = con.sql("""
WITH toks AS (
  SELECT doc_id, tok, count(*)::BIGINT AS f
  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents)
  GROUP BY 1, 2),
th AS (SELECT doc_id, tok, f, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
bits AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> b) & 1 = 1 THEN f ELSE -f END) AS s
  FROM th, range(60) t(b) GROUP BY 1, 2),
sh AS (SELECT doc_id, sum(CASE WHEN s > 0 THEN 1::BIGINT << b ELSE 0 END)::BIGINT AS simhash
       FROM bits GROUP BY 1)
SELECT a.doc_id i, b.doc_id j, bit_count(xor(a.simhash, b.simhash)) AS ham
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
ORDER BY ham LIMIT 40
""").df()
print(sim.head(40).to_string())
