"""Temporal/CEP operator soak: exact DuckDB-oracle parity AND throughput
at soak scale (default 1M events) for asof_join, interval_join,
time_rolling_window and match_sequence.

    python tools/temporal_soak.py [n_events] [n_users]

The corpus is deterministic (splitmix64 over the row index — no RNG
state, reproducible across runs and block layouts).  Events are written
to parquet once so DuckDB and Ray read the SAME bytes; every op's full
output is hash-compared against the oracle (order-insensitive), so this
is a correctness gate at 1000x the fixture size, not just a timing run.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) \
        & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) \
        & np.uint64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> np.uint64(31))


def make_events(n: int, n_users: int) -> pa.Table:
    i = np.arange(n, dtype=np.uint64)
    h = splitmix64(i)
    users = (h % np.uint64(n_users)).astype(np.int64)
    # ~30 days of microseconds, deterministic jitter
    t0 = 1_700_000_000_000_000
    ts = t0 + ((splitmix64(i + np.uint64(1 << 32))
                % np.uint64(30 * 86400 * 1_000_000))).astype(np.int64)
    kinds = np.array(["click", "purchase", "signup", "view", "error"])
    etype = kinds[(h >> np.uint64(8)) % np.uint64(5)]
    val = ((h >> np.uint64(16)) % np.uint64(1000)).astype(np.int64)
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(users),
        "event_type": pa.array(etype.tolist(), pa.string()),
        "value": pa.array(val.astype(float)),
    })


def canon_hash(df) -> int:
    from pandas.util import hash_pandas_object

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True)
    return int(hash_pandas_object(df, index=False).sum())


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_users = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    path = f"/tmp/paradedb_ray_data/temporal_soak_{n}_{n_users}.parquet"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if not os.path.exists(path):
        pq.write_table(make_events(n, n_users), path)

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)
    import pyarrow.compute as pc

    import ray.data
    from paradedb_ray.pipelines.aggregate import time_rolling_window
    from paradedb_ray.pipelines.joins import asof_join, interval_join
    from paradedb_ray.pipelines.relational import filter_batches
    from paradedb_ray.pipelines.windows import match_sequence

    con = duckdb.connect()
    results = {}

    def read():
        return ray.data.read_parquet(path, override_num_blocks=64)

    # warm the worker pool (CLAUDE.md bench discipline)
    read().map_batches(lambda b: b, batch_format="pyarrow").count()

    # ---- asof_join: purchase -> most recent prior click per user
    t1 = time.time()
    ev = read()
    left = filter_batches(ev, lambda b: pc.equal(b.column("event_type"),
                                                 "purchase"),
                          columns=["event_id", "ts", "user_id", "value"])
    right = filter_batches(ev, lambda b: pc.equal(b.column("event_type"),
                                                  "click"),
                           columns=["event_id", "ts", "user_id"])
    right = right.map_batches(
        lambda b: b.rename_columns(["click_id", "click_ts", "user_id"]),
        batch_format="pyarrow", batch_size=None)
    mine = asof_join(left, right, on="user_id", left_ts="ts",
                     right_ts="click_ts",
                     right_cols=["click_id", "click_ts"],
                     tie_col="click_id", how="left").to_pandas()
    dt = time.time() - t1
    orc = con.execute(f"""
      WITH p AS (SELECT event_id, ts, user_id, value FROM '{path}'
                 WHERE event_type='purchase'),
           c AS (SELECT event_id AS click_id, ts AS click_ts, user_id
                 FROM '{path}' WHERE event_type='click')
      SELECT p.event_id, p.ts, p.user_id, p.value, c.click_id, c.click_ts
      FROM p LEFT JOIN c ON c.user_id=p.user_id AND c.click_ts <= p.ts
      QUALIFY row_number() OVER (PARTITION BY p.event_id
        ORDER BY c.click_ts DESC, c.click_id DESC) = 1""").df()
    assert len(mine) == len(orc), (len(mine), len(orc))
    assert canon_hash(mine) == canon_hash(orc), "asof_join hash mismatch"
    results["asof_join"] = {"rows": len(mine), "sec": round(dt, 2),
                            "events_per_s": int(n / dt)}
    print("asof_join       ok", results["asof_join"], flush=True)

    # ---- interval_join: clicks inside signup 3-day windows
    t1 = time.time()
    ev = read()
    clicks = filter_batches(ev, lambda b: pc.equal(b.column("event_type"),
                                                   "click"),
                            columns=["event_id", "ts", "user_id"])
    clicks = clicks.map_batches(
        lambda b: b.rename_columns(["click_id", "c_ts", "user_id"]),
        batch_format="pyarrow", batch_size=None)
    sign = filter_batches(ev, lambda b: pc.equal(b.column("event_type"),
                                                 "signup"),
                          columns=["event_id", "ts", "user_id"])

    def mk(b):
        s = b.column("ts").cast(pa.timestamp("us"))
        e = pc.add(s, pa.scalar(3 * 86400 * 1_000_000, pa.duration("us")))
        return pa.table({"signup_id": b.column("event_id"),
                         "user_id": b.column("user_id"),
                         "s_ts": s, "e_ts": e})

    sign = sign.map_batches(mk, batch_format="pyarrow", batch_size=None)
    mine = interval_join(clicks, sign, on="user_id", left_ts="c_ts",
                         right_start="s_ts", right_end="e_ts",
                         bucket="1d").to_pandas()
    dt = time.time() - t1
    orc = con.execute(f"""
      WITH s AS (SELECT event_id AS signup_id, user_id, ts AS s_ts,
                        ts + INTERVAL 3 DAY AS e_ts FROM '{path}'
                 WHERE event_type='signup'),
           c AS (SELECT event_id AS click_id, ts AS c_ts, user_id
                 FROM '{path}' WHERE event_type='click')
      SELECT c.click_id, c.c_ts, c.user_id, s.signup_id, s.s_ts, s.e_ts
      FROM c JOIN s ON c.user_id=s.user_id
        AND c.c_ts >= s.s_ts AND c.c_ts <= s.e_ts""").df()
    assert len(mine) == len(orc), (len(mine), len(orc))
    assert canon_hash(mine) == canon_hash(orc), "interval_join mismatch"
    results["interval_join"] = {"rows": len(mine), "sec": round(dt, 2),
                                "events_per_s": int(n / dt)}
    print("interval_join   ok", results["interval_join"], flush=True)

    # ---- time_rolling_window: 1h RANGE frames per user over ALL events
    t1 = time.time()
    mine = time_rolling_window(
        read(), ["user_id"], "ts",
        {"c1h": ("count", "value"), "s1h": ("sum", "value"),
         "mx1h": ("max", "value")}, window="1h").to_pandas()
    dt = time.time() - t1
    orc = con.execute(f"""
      SELECT event_id, ts, user_id, event_type, value,
        count(value) OVER w AS c1h, sum(value) OVER w AS s1h,
        max(value) OVER w AS mx1h
      FROM '{path}' WINDOW w AS (PARTITION BY user_id ORDER BY ts
        RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""").df()
    assert len(mine) == len(orc)
    assert canon_hash(mine) == canon_hash(orc), "time_rolling mismatch"
    results["time_rolling"] = {"rows": len(mine), "sec": round(dt, 2),
                               "events_per_s": int(n / dt)}
    print("time_rolling    ok", results["time_rolling"], flush=True)

    # ---- match_sequence: click immediately followed by purchase < 1h
    t1 = time.time()
    mine = match_sequence(
        read(), "user_id",
        [("ts", "ascending"), ("event_id", "ascending")],
        steps=[("event_type", "click"), ("event_type", "purchase")],
        emit=[(0, "event_id", "click_id"), (1, "event_id", "purchase_id")],
        within="1h", ts_col="ts").to_pandas()
    dt = time.time() - t1
    orc = con.execute(f"""
      WITH w AS (SELECT user_id, event_id, ts, event_type,
        LEAD(event_type) OVER win AS t2, LEAD(event_id) OVER win AS id2,
        LEAD(ts) OVER win AS ts2 FROM '{path}'
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT user_id, event_id AS click_id, id2 AS purchase_id
      FROM w WHERE event_type='click' AND t2='purchase'
        AND ts2 - ts <= INTERVAL 1 HOUR""").df()
    assert len(mine) == len(orc), (len(mine), len(orc))
    assert canon_hash(mine) == canon_hash(orc), "match_sequence mismatch"
    results["match_sequence"] = {"rows": len(mine), "sec": round(dt, 2),
                                 "events_per_s": int(n / dt)}
    print("match_sequence  ok", results["match_sequence"], flush=True)

    # ---- sessionize -> within-session CEP (composite key)
    t1 = time.time()
    from paradedb_ray.pipelines.windows import sessionize

    sd = sessionize(read(), "user_id", "ts", gap="30m")
    mine = match_sequence(
        sd, ["user_id", "session_id"],
        [("ts", "ascending"), ("event_id", "ascending")],
        steps=[("event_type", "click"), ("event_type", "purchase")],
        emit=[(0, "event_id", "click_id"),
              (1, "event_id", "purchase_id")]).to_pandas()
    dt = time.time() - t1
    orc = con.execute(f"""
      WITH g AS (SELECT user_id, event_id, ts, event_type,
        CASE WHEN ts - LAG(ts) OVER win > INTERVAL 30 MINUTE
          THEN 1 ELSE 0 END AS brk FROM '{path}'
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s AS (SELECT user_id, event_id, ts, event_type,
        CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM g),
      w AS (SELECT user_id, session_id, event_id, event_type,
        LEAD(event_type) OVER win3 AS t2, LEAD(event_id) OVER win3 AS id2
        FROM s WINDOW win3 AS (PARTITION BY user_id, session_id
          ORDER BY ts, event_id))
      SELECT user_id, session_id, event_id AS click_id, id2 AS purchase_id
      FROM w WHERE event_type='click' AND t2='purchase'""").df()
    assert len(mine) == len(orc), (len(mine), len(orc))
    assert canon_hash(mine) == canon_hash(orc), "cep_in_session mismatch"
    results["cep_in_session"] = {"rows": len(mine), "sec": round(dt, 2),
                                 "events_per_s": int(n / dt)}
    print("cep_in_session  ok", results["cep_in_session"], flush=True)

    import json
    print(json.dumps({"n_events": n, "n_users": n_users, "ops": results}))
    ray.shutdown()


if __name__ == "__main__":
    main()
