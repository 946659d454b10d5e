#!/usr/bin/env python3
"""Local differential oracle pre-check (SURVEY.md §5.2 layer 1).

Replays the driver's t2 gate: for each parquet result that graft.Verify
wrote, run the declared oracle SQL in DuckDB over the same testdata
parquet and compare strictly (columns sorted by name, rows in produced
order, exact value equality). Run AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`.

Usage: python3 scripts/precheck.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)


# Keys whose DuckDB twin is STRUCTURALLY unable to finish at derived
# scale (not a tuning matter — q_dedup_semantic_keep's recursive
# min-label closure materializes O(|V| x |component|) reach pairs over
# the giant component; AS MATERIALIZED measured not to help, SCALE.md
# round 12). On an oracle-timeout SKIP the registered split
# differential runs IN-GATE: it must pass for the run to stay green,
# and the key is then recorded as a first-class differential pass
# instead of an evidence gap (VERDICT r12 #5).
DIFFERENTIALS = {"q_dedup_semantic_keep": "semantic_keep_diff.py"}


def run_differential(name, sf_dir, out_dir):
    """Run the key's registered split differential; True/False on a
    registered key's pass/fail, None when the key has none."""
    script = DIFFERENTIALS.get(name)
    if not script:
        return None
    import subprocess
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), script)
    engine = os.path.join(out_dir, name)  # Verify's layout: outDir/<name>
    r = subprocess.run([sys.executable, path, sf_dir, engine],
                       capture_output=True, text=True)
    for line in (r.stdout + "\n" + r.stderr).strip().splitlines():
        if line.strip():
            print(f"    | {line}")
    return r.returncode == 0


def main(sf_dir, out_dir):
    con = duckdb.connect()
    # scale-probe controls (all inert unless set — the driver's own
    # invocation passes nothing): PRECHECK_MEMORY_LIMIT caps DuckDB and
    # spills to disk instead of OOMing the host on derived 10x corpora;
    # PRECHECK_TIMEOUT_S interrupts a single runaway ORACLE (DuckDB
    # re-deriving an uncapped pair space the engine indexes around) and
    # records it as SKIP, not FAIL — the engine result is unaffected;
    # PRECHECK_RESUME_LOG skips keys a prior partial run already passed.
    mem = os.environ.get("PRECHECK_MEMORY_LIMIT")
    if mem:
        tmp = os.path.join(out_dir, "_duck_spill")
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET memory_limit='{mem}'")
        con.execute(f"SET temp_directory='{tmp}'")
    timeout_s = float(os.environ.get("PRECHECK_TIMEOUT_S", "0") or 0)
    # every run prints an out_dir identity stamp (oracle_sql.json
    # mtime+size) as its first line, so a log redirect of this run can
    # later be offered as PRECHECK_RESUME_LOG and checked for staleness
    st = os.stat(os.path.join(out_dir, "oracle_sql.json"))
    stamp = f"# outdir-stamp {st.st_mtime_ns}:{st.st_size}"
    print(stamp)
    already_ok = set()
    resume = os.environ.get("PRECHECK_RESUME_LOG")
    if resume and os.path.exists(resume):
        with open(resume) as f:
            lines = f.readlines()
        stamped = next((l.strip() for l in lines
                        if l.startswith("# outdir-stamp")), None)
        if stamped != stamp:
            # a stale log (different Verify run, or pre-stamp legacy)
            # must not mask a regression — refuse to resume from it
            print(f"  resume log ignored: outdir stamp mismatch "
                  f"({stamped!r} != {stamp!r})")
        else:
            for line in lines:
                if line.startswith("  OK   "):
                    already_ok.add(line.split()[1])
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written table: a DIRECTORY of part files (the
            # ScaleGen corpora land this way); glob the parts
            p = os.path.join(p, "*.parquet")
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    n_pass = n_fail = n_skip = n_diff = 0
    failures = []
    for name in sorted(oracle):
        if name in already_ok:
            n_pass += 1
            print(f"  OK   {name} (resumed from prior log)")
            continue
        res_dir = os.path.join(out_dir, name)
        files = sorted(glob.glob(os.path.join(res_dir, "*.parquet")))
        if not files:
            failures.append((name, "no spark result parquet"))
            n_fail += 1
            continue
        try:
            spark_df = con.execute(
                "SELECT * FROM read_parquet(?)", [files]).fetchdf()
            # lint: reject oracle output types the driver's hasher treats
            # differently from Spark's (HUGEINT from uncast sums bit us in
            # round 7 — DuckDB types sum(BIGINT) as int128)
            desc = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
            bad_types = [(c, t) for c, t, *_ in desc
                         if "HUGEINT" in t.upper() or "INT128" in t.upper()
                         or t.upper() in ("UNKNOWN", "ANY")]
            if bad_types:
                failures.append(
                    (name, f"oracle output type not hash-stable: {bad_types} "
                           f"— cast to BIGINT/DOUBLE in the oracle SQL"))
                n_fail += 1
                continue
            # lint: reject ARRAY/LIST/STRUCT/MAP output columns on EITHER
            # side — the driver's comparer sorts result frames with pandas
            # and dies on unhashable ndarray cells (q_embed_whiten, round
            # 9). Serialize nested values (int-quantized array_join or
            # long-form rows) before declaring the key.
            spark_desc = con.execute(
                "DESCRIBE SELECT * FROM read_parquet(?)", [files]).fetchall()
            nested = [(side, c, t)
                      for side, d in (("spark", spark_desc), ("oracle", desc))
                      for c, t, *_ in d
                      if "[]" in t or t.upper().startswith(("STRUCT", "MAP("))]
            if nested:
                failures.append(
                    (name, f"nested output column (driver comparer cannot "
                           f"sort it): {nested} — serialize to string or "
                           f"emit long-form rows"))
                n_fail += 1
                continue
            if timeout_s > 0:
                import threading
                import time
                fired = threading.Event()

                def _interrupt():
                    fired.set()
                    con.interrupt()
                timer = threading.Timer(timeout_s, _interrupt)
                t0 = time.monotonic()
                timer.start()
                def timed_out(why):
                    # a registered split differential turns the skip
                    # into a first-class pass/fail; only unregistered
                    # keys remain SKIPs
                    nonlocal n_pass, n_fail, n_skip, n_diff
                    diff = run_differential(name, sf_dir, out_dir)
                    if diff is True:
                        print(f"  OK   {name} (split differential; "
                              f"oracle {why})")
                        n_pass += 1
                        n_diff += 1
                    elif diff is False:
                        failures.append(
                            (name, f"oracle {why} AND the split "
                                   f"differential FAILED"))
                        n_fail += 1
                    else:
                        print(f"  SKIP {name}: oracle {why}")
                        n_skip += 1
                try:
                    duck_df = con.execute(oracle[name]).fetchdf()
                except duckdb.InterruptException:
                    timed_out(f"exceeded {timeout_s:.0f}s")
                    continue
                except RuntimeError as e:
                    # only classify as a timeout SKIP when the timer
                    # plausibly fired — a fast RuntimeError is a genuine
                    # oracle failure and must FAIL, not weaken the gate
                    if fired.is_set() or \
                            time.monotonic() - t0 >= timeout_s * 0.95:
                        timed_out(f"exceeded {timeout_s:.0f}s "
                                  f"({type(e).__name__})")
                        continue
                    raise
                finally:
                    timer.cancel()
                    if fired.is_set():
                        # the interrupt may have landed AFTER fetchdf
                        # returned — drain it so the next key's query
                        # isn't spuriously interrupted
                        try:
                            con.execute("SELECT 1").fetchall()
                        except duckdb.InterruptException:
                            pass
            else:
                duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            failures.append((name, f"exec error: {e}"))
            n_fail += 1
            continue
        s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
        if s_cols != d_cols:
            failures.append((name, f"columns differ: spark={s_cols} duck={d_cols}"))
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            failures.append((name, f"rows differ: spark={len(spark_df)} duck={len(duck_df)}"))
            n_fail += 1
            continue
        # row-order-sensitive compare inside duckdb (positional join):
        # exact value equality incl. doubles/arrays, ~100x the python loop
        con.register("t_spark", spark_df[s_cols])
        con.register("t_duck", duck_df[s_cols])
        cond = " AND ".join(
            f's."{c}" IS NOT DISTINCT FROM d."{c}"' for c in s_cols)
        bad = con.execute(
            f"SELECT count(*) FROM t_spark s POSITIONAL JOIN t_duck d "
            f"WHERE NOT ({cond})").fetchone()[0]
        con.unregister("t_spark")
        con.unregister("t_duck")
        if bad:
            # python fallback pinpoints the first differing row/col
            spark_df, duck_df = spark_df[s_cols], duck_df[s_cols]
            mismatch = f"{bad} differing rows"
            for i in range(len(spark_df)):
                done = False
                for c in s_cols:
                    va, vb = spark_df[c].iloc[i], duck_df[c].iloc[i]
                    a = norm(va.tolist() if hasattr(va, "tolist") else va)
                    b = norm(vb.tolist() if hasattr(vb, "tolist") else vb)
                    if a != b:
                        mismatch = f"row {i} col {c}: spark={a} duck={b}"
                        done = True
                        break
                if done:
                    break
            failures.append((name, mismatch))
            n_fail += 1
        else:
            n_pass += 1
            print(f"  OK   {name} ({len(spark_df)} rows)")

    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    diff_note = f", {n_diff} via split differential" if n_diff else ""
    skip_note = f", {n_skip} skip (oracle timeout)" if n_skip else ""
    print(f"precheck: {n_pass} pass, {n_fail} fail{diff_note}{skip_note}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
