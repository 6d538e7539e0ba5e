"""Unit tests for the continuation-#9 data-ops internals (the
driver-mimic harness in test_relational.py covers the end-to-end
oracle equality; these pin the vectorized kernels in isolation)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from weakscraper_ray.pipelines import dataops as d


# ---------------------------------------------------------------- pairs

def test_pairs_within_groups_matches_bruteforce():
    rng = np.random.RandomState(7)
    order = np.sort(rng.randint(0, 40, 300).astype(np.int64))
    part = rng.randint(1, 50, 300).astype(np.int64)
    df = (
        pd.DataFrame({"k": order, "part": part})
        .drop_duplicates()
        .sort_values(["k", "part"])
    )
    got = d._pairs_within_groups(
        df["k"].to_numpy(np.int64), df["part"].to_numpy(np.int64)
    )
    want = []
    for _, g in df.groupby("k"):
        ps = g["part"].to_numpy()
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                want.append(int(ps[i]) * (1 << 32) + int(ps[j]))
    assert sorted(got.tolist()) == sorted(want)


def test_pairs_within_groups_empty_and_singletons():
    assert len(d._pairs_within_groups(np.empty(0, np.int64),
                                      np.empty(0, np.int64))) == 0
    # three singleton baskets -> no pairs
    got = d._pairs_within_groups(
        np.array([1, 2, 3], np.int64), np.array([9, 8, 7], np.int64)
    )
    assert len(got) == 0


# ---------------------------------------------------------------- morton

def test_morton_lut_interleave_roundtrip():
    lut = d._MORTON
    for x, y in [(0, 0), (255, 255), (3, 5), (170, 85), (200, 1)]:
        z = int(lut[x] | (lut[y] << 1))
        # decode by collecting even/odd bits
        dx = sum(((z >> (2 * i)) & 1) << i for i in range(8))
        dy = sum(((z >> (2 * i + 1)) & 1) << i for i in range(8))
        assert (dx, dy) == (x, y)


def test_zorder_tiles_are_8x8_rectangles():
    # every 64-z-code tile covers exactly an aligned 8x8 (x, y) square
    lut = d._MORTON
    xs = np.arange(256)
    z = lut[xs][:, None] | (lut[xs][None, :] << 1)  # z[x, y]
    tile = z >> d._ZTILE_SHIFT
    for t in [0, 1, 500, 1023]:
        pos = np.argwhere(tile == t)
        assert len(pos) == 64
        x_span = pos[:, 0].max() - pos[:, 0].min()
        y_span = pos[:, 1].max() - pos[:, 1].min()
        assert x_span == 7 and y_span == 7


# ---------------------------------------------------------------- bpe

def test_bpe_partial_masks_spaces_and_doc_boundaries():
    batch = pa.table({"text": ["abc", "cab"]})
    out = d._bpe_partial(batch).to_pandas()
    got = {
        (chr(int(p) // 256) + chr(int(p) % 256)): int(n)
        for p, n in zip(out["pair_id"], out["n"])
    }
    # "abc" -> ab, bc ; "cab" -> ca, ab ; the c|(sep)|c junction is masked
    assert got == {"ab": 2, "bc": 1, "ca": 1}


def test_bpe_partial_single_space_heavy():
    batch = pa.table({"text": ["a b", " ", ""]})
    out = d._bpe_partial(batch).to_pandas()
    assert out["n"].sum() == 0  # every pair touches ' ' or the separator


# ---------------------------------------------------------------- upsert

def test_upsert_log_and_merge_lww():
    batch = pa.table(
        {
            # 77 hits %7 and %11 (delete wins over its own update);
            # 13 spawns an insert under -13; 5 is untouched
            "o_orderkey": pa.array([77, 13, 5], pa.int64()),
            "o_totalprice": pa.array([10.0, 20.0, 30.0], pa.float64()),
        }
    )
    log = d._upsert_log(batch).to_pandas()
    merged = d._upsert_merge(log)
    rows = {
        int(r.o_orderkey): (int(r.cents), int(r.version))
        for r in merged.itertuples()
    }
    assert 77 not in rows                      # tombstone (v2) wins
    assert rows[13] == (2000, 0)               # base row untouched
    assert rows[-14] == (2000, 1)              # spawned insert at -(k+1)
    assert rows[5] == (3000, 0)
    assert set(rows) == {13, -14, 5}


def test_upsert_insert_key_never_collides_with_zero():
    # o_orderkey = 0 exists in the real data: 0 hits %7/%11/%13 all at
    # once; the insert must land at -1 and survive the key-0 tombstone
    batch = pa.table(
        {
            "o_orderkey": pa.array([0], pa.int64()),
            "o_totalprice": pa.array([10.0], pa.float64()),
        }
    )
    merged = d._upsert_merge(d._upsert_log(batch).to_pandas())
    rows = {int(r.o_orderkey): (int(r.cents), int(r.version))
            for r in merged.itertuples()}
    assert rows == {-1: (1000, 1)}


# ---------------------------------------------------------------- stats

def test_duckdb_ln_matches_python_math_log():
    # stats.py's exactness argument rests on DuckDB ln == math.log
    # bit-for-bit over the integer count/rank range the queries feed it
    import math

    import duckdb

    vals = list(range(1, 5001)) + [10 ** k for k in range(1, 10)]
    rows = duckdb.connect().execute(
        "SELECT x, ln(cast(x AS DOUBLE)) FROM (SELECT unnest(?) AS x)", [vals]
    ).fetchall()
    assert all(l == math.log(x) for x, l in rows)


def test_q_e6_half_away_from_zero():
    from weakscraper_ray.pipelines import stats as s

    assert s._q_e6(1.0000005) == 1000001      # .5 rounds away
    assert s._q_e6(0.0) == 0
    assert s._away(2.5) == 3 and s._away(-2.5) == -3
    assert s._away(2.4) == 2 and s._away(-2.4) == -2


def test_ab_partial_sums():
    from weakscraper_ray.pipelines import stats as s

    batch = pa.table(
        {
            "user_id": pa.array([0, 1, 2, 3], pa.int64()),
            "value": pa.array([1.0, 2.0, 3.0, 4.005], pa.float64()),
        }
    )
    out = s._ab_partial(batch).to_pandas().set_index("variant")
    # variant 0: users 0,2 -> cents 100, 300 ; variant 1: 200, 401 (.5 away)
    assert out.loc[0, "n"] == 2 and out.loc[0, "sy"] == 400
    assert out.loc[0, "syy"] == 100 * 100 + 300 * 300
    assert out.loc[1, "sy"] == 601
    assert out.loc[1, "syy"] == 200 * 200 + 401 * 401


# ---------------------------------------------------------------- mlm

def test_mlm_batch_positional_rule():
    from weakscraper_ray.pipelines import curation as c

    toks = [f"w{i}" for i in range(16)]
    batch = pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()),
         "text": pa.array([" ".join(toks), "a b"], pa.string())}
    )
    out = c._mlm_batch(batch).to_pandas().set_index("doc_id")
    inp = out.loc[1, "input_text"].split()
    # 0-based indices 3 and 10 are masked in a 16-token doc
    assert [i for i, w in enumerate(inp) if w == "<mask>"] == [3, 10]
    assert out.loc[1, "target_text"] == "w3 w10"
    assert out.loc[2, "input_text"] == "a b"      # too short: untouched
    assert out.loc[2, "target_text"] == ""


# ------------------------------------------------------------ compaction

def test_compaction_sequential_fill_rule():
    from weakscraper_ray.pipelines import dataops as d

    # sizes 10, 7, 5, 3 with target 12: cumsum-before 0,10,17,22
    b = np.array([10, 7, 5, 3], np.int64)
    cs_before = np.concatenate(([0], np.cumsum(b)[:-1]))
    assert (cs_before // 12).tolist() == [0, 0, 1, 1]
    assert d._COMPACT_TARGET > 0


# ---------------------------------------------------------------- rolling

def test_daily_partial_routes_types():
    from weakscraper_ray.pipelines import stats as s

    batch = pa.table(
        {
            "event_type": pa.array(["click", "view", "error", "click"]),
            "ts": pa.array([0, 1, 2, 86_400_000_000], pa.timestamp("us")),
            "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
        }
    )
    out = s._daily_partial(batch).to_pandas().set_index("day")
    assert out.loc[0, "x"] == 100 and out.loc[0, "y"] == 200  # error ignored
    assert out.loc[1, "x"] == 400 and out.loc[1, "y"] == 0


# ---------------------------------------------------------------- late

def test_akey_scramble_bijective_and_mod_equals_mask():
    from weakscraper_ray.pipelines import series as s

    eid = np.arange(100_000, dtype=np.int64)
    ak = s._akey(eid)
    assert len(np.unique(ak)) == len(eid)          # odd multiplier: bijective
    assert (ak == (eid * s._LCG_A + s._LCG_C) % s._LCG_M).all()
    assert ak.min() >= 0


def test_late_prefix_scan_matches_bruteforce():
    # two-phase scan (chunk carry + within-chunk exclusive cummax) must
    # equal the single-sequence watermark on a permuted series
    rng = np.random.RandomState(3)
    s = rng.randint(0, 10_000, 500).astype(np.int64)
    ak = np.arange(500, dtype=np.int64)
    chunk = ak // 64
    sent = np.iinfo(np.int64).min
    # brute force over the whole sequence
    wm_true = np.concatenate(([sent], np.maximum.accumulate(s)[:-1]))
    # chunked: carry = exclusive running max of per-chunk maxes
    got = np.empty_like(wm_true)
    carry = sent
    for c in np.unique(chunk):
        m = chunk == c
        sv = s[m]
        prev = np.concatenate(([sent], np.maximum.accumulate(sv)[:-1]))
        got[m] = np.maximum(prev, carry)
        carry = max(carry, int(sv.max()))
    assert (got == wm_true).all()


# ---------------------------------------------------------------- rules

def test_rules_partial_counts():
    batch = pa.table(
        {
            "o_totalprice": pa.array([-1.0, 500000.0, 10.0], pa.float64()),
            "o_orderstatus": pa.array(["O", "X", "F"], pa.string()),
            "o_orderpriority": pa.array(["1-URGENT", "9-BAD", "3-MEDIUM"],
                                        pa.string()),
            "o_orderdate": pa.array(
                [0, d._EPOCH_US_2000, d._EPOCH_US_2000 - 1], pa.timestamp("us")
            ),
        }
    )
    out = d._rules_partial(batch).to_pandas().set_index("rule")
    assert out.loc["totalprice_positive", "violations"] == 1
    assert out.loc["totalprice_ceiling", "violations"] == 1
    assert out.loc["date_before_2000", "violations"] == 1
    assert out.loc["status_in_domain", "violations"] == 1
    assert out.loc["priority_format", "violations"] == 1
    assert (out["n_checked"] == 3).all()
