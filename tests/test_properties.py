"""Property-based tests (hypothesis): invariants of the scalar
expression library that must hold for ANY input, checked by shipping
each generated batch through Spark once (one job per example batch,
not per value)."""

from __future__ import annotations

import pytest

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from musicflow_spark.functions.strings import with_fixed_title
from musicflow_spark.functions.timeutils import iso8601_duration_to_ms, ms_to_clock
from musicflow_spark.operators.dedup import shingles
from musicflow_spark.operators.textstats import tokens

SET = settings(max_examples=8, deadline=None)

_spark = None


def _get_spark():
    # reuse the session-scoped fixture session (already created by
    # conftest's first use); hypothesis @given can't take fixtures
    global _spark
    if _spark is None:
        from musicflow_spark.session import get_spark

        _spark = get_spark("tests", cpus=8)
    return _spark


titles = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=60
)


@SET
@given(st.lists(titles, min_size=1, max_size=30))
def test_fix_title_never_blanks_nonblank_input(batch):
    spark = _get_spark()
    df = spark.createDataFrame([(t,) for t in batch], "title string")
    out = with_fixed_title(df, "title").select("title", "fixed_title").collect()
    for r in out:
        # the per-step undo guarantees: non-blank input -> non-blank output
        if r["title"].strip():
            assert r["fixed_title"].strip() != ""
        # blank input passes through
        else:
            assert r["fixed_title"] == r["title"]


@SET
@given(st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=50))
def test_ms_to_clock_matches_python(batch):
    spark = _get_spark()
    df = spark.createDataFrame([(v,) for v in batch], "ms bigint")
    out = {r["ms"]: r["clock"] for r in df.select("ms", ms_to_clock("ms").alias("clock")).collect()}
    for ms in batch:
        s = ms // 1000
        want = f"{s // 3600:02d}:{(s % 3600) // 60:02d}:{s % 60:02d}"
        assert out[ms] == want


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=23),
            st.integers(min_value=0, max_value=59),
            st.integers(min_value=0, max_value=59),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_iso_duration_roundtrip(batch):
    spark = _get_spark()
    rows = []
    for h, m, s in batch:
        iso = "PT"
        if h:
            iso += f"{h}H"
        if m:
            iso += f"{m}M"
        iso += f"{s}S"
        rows.append((iso, (h * 3600 + m * 60 + s) * 1000))
    df = spark.createDataFrame(rows, "iso string, want bigint")
    bad = df.filter(iso8601_duration_to_ms("iso") != F.col("want"))
    assert bad.count() == 0


@SET
@given(st.lists(st.text(alphabet="ab c", min_size=0, max_size=40), min_size=1, max_size=30))
def test_shingle_count_bound(batch):
    spark = _get_spark()
    df = spark.createDataFrame([(t,) for t in batch], "text string")
    out = df.select(
        F.size(tokens("text")).alias("n_toks"),
        F.size(shingles("text", n=3)).alias("n_sh"),
    ).collect()
    for r in out:
        if r["n_toks"] < 3:
            assert r["n_sh"] == 0
        else:
            # distinct shingles: at most n_toks - 2, at least 1
            assert 1 <= r["n_sh"] <= r["n_toks"] - 2


@SET
@given(st.lists(st.text(min_size=0, max_size=60), min_size=1, max_size=50))
def test_portable_hash60_matches_duckdb(batch):
    """The md5-based 60-bit portable hash must be bit-identical on
    Spark and DuckDB for ARBITRARY unicode input — it is what makes
    the simhash oracle an exact pipeline replica."""
    import duckdb

    from musicflow_spark.operators.dedup import portable_hash60

    spark = _get_spark()
    df = spark.createDataFrame([(i, t) for i, t in enumerate(batch)], "i long, t string")
    got = {r["i"]: r["h"] for r in df.select("i", portable_hash60(F.col("t")).alias("h")).collect()}
    con = duckdb.connect()
    want = dict(
        con.execute(
            "SELECT i, ('0x' || substr(md5(t), 1, 15))::BIGINT "
            "FROM (SELECT unnest(range(len($b))) AS i, unnest($b) AS t)",
            {"b": batch},
        ).fetchall()
    )
    assert got == want


def _lev(a: str, b: str) -> int:
    # reference DP edit distance for the fuzzy-join property
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@SET
@given(st.lists(st.text(alphabet="abc", min_size=0, max_size=8), min_size=2, max_size=20))
def test_fuzzy_pairs_dist1_matches_quadratic(strings):
    # small alphabet + short strings force dense deletion-key
    # collisions; the blocked join must equal the quadratic scan
    from musicflow_spark.operators.fuzzyjoin import fuzzy_pairs_dist1

    spark = _get_spark()
    rows = list(enumerate(strings))
    df = spark.createDataFrame(rows, "id int, s string")
    got = {
        (r.id_a, r.id_b, r.dist) for r in fuzzy_pairs_dist1(df, "id", "s").collect()
    }
    want = {
        (i, j, _lev(a, b))
        for i, a in rows
        for j, b in rows
        if i < j and _lev(a, b) <= 1
    }
    assert got == want


@SET
@given(
    st.lists(st.text(alphabet="abcxyz", min_size=1, max_size=4), min_size=1, max_size=60),
    st.integers(min_value=0, max_value=2),
)
def test_cms_merge_split_invariance(keys, n_cuts):
    """For ANY key multiset and ANY split into up to 3 parts, the
    merged partial sketches equal the one-pass sketch counter for
    counter — the algebraic property incremental/streaming CMS
    maintenance rests on."""
    from musicflow_spark.operators.cms import cms_build, cms_merge

    spark = _get_spark()
    depth, width = 3, 32
    full = spark.createDataFrame([(k,) for k in keys], "key string")
    direct = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_build(full, "key", depth, width).collect()
    }
    cuts = sorted({0, len(keys), *(len(keys) * (i + 1) // (n_cuts + 1) for i in range(n_cuts))})
    parts = [
        spark.createDataFrame([(k,) for k in keys[a:b]] or [("__e__",)], "key string")
        .limit(0 if not keys[a:b] else len(keys[a:b]))
        for a, b in zip(cuts, cuts[1:])
    ]
    sketches = [cms_build(p, "key", depth, width) for p in parts]
    merged = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_merge(*sketches).collect()
    }
    assert merged == direct


@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    ch=st.sampled_from([1, 3, 4]),
    data=st.data(),
)
@SET
def test_png_roundtrip_any_pixels(h, w, ch, data):
    """decode(encode(pixels)) == pixels for ANY uint8 image in the
    supported shapes — the stdlib codec is lossless, no Spark needed
    (pure executor-side code)."""
    import numpy as np

    from musicflow_spark.operators.pngcodec import decode_png, encode_png

    flat = data.draw(
        st.lists(st.integers(0, 255), min_size=h * w * ch, max_size=h * w * ch)
    )
    px = np.array(flat, dtype=np.uint8).reshape(h, w, ch)
    assert np.array_equal(decode_png(encode_png(px)), px)


@given(
    h=st.integers(1, 10),
    w=st.integers(1, 10),
    f=st.integers(0, 4),
    data=st.data(),
)
@SET
def test_png_decoder_inverts_any_filtered_stream(h, w, f, data):
    """The decoder reconstructs ANY image through each of the five
    PNG scan filters (the encoder only emits filter 0, so this drives
    the Sub/Up/Average/Paeth reconstruction paths on arbitrary
    pixels, not just gradients)."""
    import numpy as np

    from musicflow_spark.operators.pngcodec import decode_png
    from tests.test_multimodal import _filtered_png

    flat = data.draw(
        st.lists(st.integers(0, 255), min_size=h * w * 3, max_size=h * w * 3)
    )
    px = np.array(flat, dtype=np.uint8).reshape(h, w, 3)
    assert np.array_equal(decode_png(_filtered_png(px, f)), px)


def test_canonical_url_drops_tracking_and_case(spark):
    from musicflow_spark.functions.strings import canonical_url, url_host

    df = spark.createDataFrame(
        [
            ("HTTPS://WWW.News.Example.COM/a/B?utm=1#frag",),
            ("http://example.org/path/x?q=2",),
            ("https://wwwx.example.net/y",),  # wwwx is NOT a www. prefix
            ("https://example.com/",),
        ],
        "url string",
    )
    rows = df.select(
        url_host("url").alias("h"), canonical_url("url").alias("c")
    ).collect()
    assert [r.h for r in rows] == [
        "news.example.com", "example.org", "wwwx.example.net", "example.com",
    ]
    assert [r.c for r in rows] == [
        "https://news.example.com/a/B",   # path case preserved, query+frag dropped
        "http://example.org/path/x",
        "https://wwwx.example.net/y",
        "https://example.com/",
    ]


@SET
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(-1000, 1000)),
        min_size=0, max_size=25, unique_by=lambda t: t[0],
    ),
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(-1000, 1000)),
        min_size=0, max_size=25, unique_by=lambda t: t[0],
    ),
    st.integers(-500, 500),
)
def test_merge_into_matches_reference_semantics(base_rows, upd_rows, thresh):
    """merge_into == the dict-based reference merge on arbitrary
    disjoint-key frames: matched rows update (or delete past the
    threshold), unmatched-by-source carry, unmatched-by-base insert."""
    from pyspark.sql import functions as F

    from musicflow_spark.operators.mergeinto import merge_into

    spark = _get_spark()
    base = spark.createDataFrame(base_rows, "k int, v int") if base_rows else \
        spark.createDataFrame([], "k int, v int")
    upd = spark.createDataFrame(upd_rows, "k int, d int") if upd_rows else \
        spark.createDataFrame([], "k int, d int")
    out = merge_into(
        base, upd, on=["k"],
        update_set={"v": F.col("v") + F.col("d")},
        delete_when=F.col("d") > thresh,
        insert_set={"v": F.col("d")},
    )
    got = {r.k: r.v for r in out.collect()}

    b, u = dict(base_rows), dict(upd_rows)
    want = {}
    for k, v in b.items():
        if k in u:
            if u[k] > thresh:
                continue  # matched-delete
            want[k] = v + u[k]  # matched-update
        else:
            want[k] = v  # carry
    for k, d in u.items():
        if k not in b:
            want[k] = d  # insert
    assert got == want


@SET
@given(
    st.lists(
        st.integers(min_value=1, max_value=10_000), min_size=3, max_size=60
    ),
    st.integers(min_value=1, max_value=25),
)
def test_pps_sample_matches_python_and_conserves(weights, k):
    """Systematic PPS over ANY weight multiset: the two-phase parallel
    form equals the single-pass python reference over the same hash
    order, Σ pick_count == k exactly, and every row heavier than one
    stride is selected."""
    import hashlib

    from musicflow_spark.operators.sampling import weighted_systematic_sample

    spark = _get_spark()
    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = {
        r["doc_id"]: (r["cum_w"], r["pick_count"])
        for r in weighted_systematic_sample(df, "n_chars", k=k).collect()
    }

    def h(i):
        return int(hashlib.md5(f"pps:{i}".encode()).hexdigest()[:15], 16)

    total = sum(weights)
    want, cum = {}, 0
    for i, w in sorted(rows, key=lambda r: (h(r[0]), r[0])):
        prev, cum = cum, cum + w
        pc = (cum * k) // total - (prev * k) // total
        if pc > 0:
            want[i] = (cum, pc)
    assert out == want
    assert sum(pc for _, pc in want.values()) == k
    stride_heavy = [i for i, w in rows if w * k > total]
    assert all(i in want for i in stride_heavy)


@SET
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["en", "fr", "de"]),
            st.lists(st.sampled_from(list("abcdef")), min_size=0, max_size=6),
        ),
        min_size=2,
        max_size=16,
    ).filter(lambda rows: len({c for c, _ in rows}) >= 2)
)
@pytest.mark.slow
def test_naive_bayes_matches_python_on_any_corpus(rows):
    """NB integer scores equal the pure-python reference on arbitrary
    tiny corpora (train = even index, test = odd), including all-OOV
    and empty documents."""
    import math

    from musicflow_spark.operators.classify import (
        NB_SCALE,
        naive_bayes_scores,
    )

    spark = _get_spark()
    train_rows = [(i, c, t) for i, (c, t) in enumerate(rows) if i % 2 == 0]
    test_rows = [(i, t) for i, (c, t) in enumerate(rows) if i % 2 == 1]
    if not train_rows or not test_rows:
        return
    train = spark.createDataFrame(
        train_rows, "doc_id long, lang string, tk array<string>"
    )
    test = spark.createDataFrame(test_rows, "doc_id long, tk array<string>")
    got = {
        (r["doc_id"], r["cls"]): r["score_micro"]
        for r in naive_bayes_scores(train, test, "lang").collect()
    }

    def rnd(x):
        return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)

    wc, ctot, docs_c, vocab = {}, {}, {}, set()
    for _, cls, toks in train_rows:
        docs_c[cls] = docs_c.get(cls, 0) + 1
        for w in toks:
            wc[(cls, w)] = wc.get((cls, w), 0) + 1
            ctot[cls] = ctot.get(cls, 0) + 1
            vocab.add(w)
    docs, vsz = sum(docs_c.values()), max(len(vocab), 1)
    want = {}
    for did, toks in test_rows:
        for cls in docs_c:
            den = ctot.get(cls, 0) + vsz
            s = rnd(math.log(docs_c[cls] / docs) * NB_SCALE)
            for w in toks:
                c = wc.get((cls, w))
                lp = math.log((c + 1.0) / den) if c else math.log(1.0 / den)
                s += rnd(lp * NB_SCALE)
            want[(did, cls)] = s
    assert got == want


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=30),   # price level
            st.integers(min_value=1, max_value=20),   # size
        ),
        min_size=1,
        max_size=40,
    )
)
def test_skyline_equals_quadratic_dominance_on_any_points(points):
    """The running-max skyline equals the quadratic dominance
    definition on ANY point multiset, including duplicate pairs (which
    never dominate each other)."""
    from musicflow_spark.queries.relational import part_price_size_skyline

    spark = _get_spark()
    rows = [(i, float(p), s) for i, (p, s) in enumerate(points)]
    df = spark.createDataFrame(
        rows, "p_partkey long, p_retailprice double, p_size int"
    ).withColumn("p_name", F.lit("x")).withColumn("p_brand", F.lit("b")) \
     .withColumn("p_type", F.lit("t"))
    import tempfile

    d = tempfile.mkdtemp(prefix="mf_sky_")
    df.write.mode("overwrite").parquet(d + "/part.parquet")
    got = {
        (r["p_partkey"], r["price_cents"], r["p_size"])
        for r in part_price_size_skyline(spark, d).collect()
    }
    pts = [(i, int(round(p * 100)), s) for i, (p, s) in
           ((r[0], (r[1], r[2])) for r in rows)]
    want = {
        (i, pc, sz)
        for i, pc, sz in pts
        if not any(
            qc <= pc and qz >= sz and (qc < pc or qz > sz)
            for _, qc, qz in pts
        )
    }
    assert got == want


@SET
@given(
    st.lists(
        st.lists(
            st.integers(min_value=1, max_value=8), min_size=1, max_size=5
        ),
        min_size=1,
        max_size=15,
    )
)
def test_association_rules_match_python_on_any_baskets(baskets):
    """support/confidence/lift on ANY basket multiset equal the
    pure-python reference (distinct items per basket, integer grids)."""
    from musicflow_spark.queries.classic import (
        AR_MIN_PAIR,
        part_association_rules,
    )

    spark = _get_spark()
    rows = [
        (ok, pk) for ok, items in enumerate(baskets) for pk in items
    ]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    import tempfile

    d = tempfile.mkdtemp(prefix="mf_ar_")
    df.write.mode("overwrite").parquet(d + "/lineitem.parquet")
    got = {
        (r["antecedent"], r["consequent"]): (
            r["c_ab"], r["c_a"], r["c_c"], r["conf_bp"], r["lift_milli"]
        )
        for r in part_association_rules(spark, d).collect()
    }
    sets = [set(b) for b in baskets]
    n = len(sets)
    item: dict[int, int] = {}
    for b in sets:
        for x in b:
            item[x] = item.get(x, 0) + 1
    pair: dict[tuple[int, int], int] = {}
    for b in sets:
        ss = sorted(b)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                pair[(ss[i], ss[j])] = pair.get((ss[i], ss[j]), 0) + 1
    want = {}
    for (a, b), c in pair.items():
        if c >= AR_MIN_PAIR:
            for ante, cons in ((a, b), (b, a)):
                want[(ante, cons)] = (
                    c, item[ante], item[cons],
                    c * 10000 // item[ante],
                    c * n * 1000 // (item[ante] * item[cons]),
                )
    assert got == want


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=25),
            st.integers(min_value=0, max_value=25),
        ),
        min_size=1,
        max_size=50,
    ),
    st.sets(st.integers(min_value=0, max_value=25), min_size=1, max_size=3),
)
def test_bfs_hops_match_python_on_any_graph(edge_list, seed_set):
    """Fixed-round BFS equals python Bellman-Ford relaxation on ANY
    undirected graph (self-loops dropped, multi-edges collapsed)."""
    from musicflow_spark.operators.graph import bfs_hops

    spark = _get_spark()
    edges = sorted({(min(a, b), max(a, b)) for a, b in edge_list if a != b})
    if not edges:
        return
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    seeds = spark.createDataFrame([(s,) for s in sorted(seed_set)], "doc_id long")
    n_rounds = 3
    got = {
        r["doc_id"]: r["hops"]
        for r in bfs_hops(seeds, pairs, n_rounds=n_rounds).collect()
    }
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seed_set}
    for _ in range(n_rounds):
        new = dict(dist)
        for u, d in dist.items():
            for v in adj.get(u, ()):
                if d + 1 < new.get(v, 1 << 60):
                    new[v] = d + 1
        dist = new
    assert got == dist


@SET
@given(
    st.lists(
        st.integers(min_value=1, max_value=500), min_size=1, max_size=12
    )
)
def test_temperature_mixture_apportionment_is_exact(counts):
    """For ANY per-source doc counts: Σalloc == K exactly, every
    allocation is within 1 of its real-valued tempered share, and a
    strictly larger source never receives a smaller allocation by
    more than the largest-remainder wiggle."""
    import tempfile

    from musicflow_spark.queries.sampling import (
        TEMP_K,
        corpus_temperature_mixture,
    )

    spark = _get_spark()
    rows = [
        (i * 1000 + j, f"t{j}", "en", f"src{i}", 10)
        for i, c in enumerate(counts)
        for j in range(c)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tempfile.mkdtemp(prefix="mf_temp_")
    df.write.mode("overwrite").parquet(d + "/documents.parquet")
    got = {r["source"]: r for r in corpus_temperature_mixture(spark, d).collect()}
    assert sum(r["alloc"] for r in got.values()) == TEMP_K
    w_total = sum(r["w_micro"] for r in got.values())
    for r in got.values():
        ideal = r["w_micro"] * TEMP_K / w_total
        assert ideal - 1 < r["alloc"] < ideal + 1


def _py_suffix_scrub(texts: dict[int, str], min_span: int) -> dict[int, tuple]:
    """Pure-python suffix_span_scrub reference: L-window occurrence
    counts, keep-first by (doc_id, pos), maximal-run coverage, ordered
    reassembly of original-case tokens."""
    toks = {d: t.split() for d, t in texts.items()}
    low = {d: [w.lower() for w in ws] for d, ws in toks.items()}
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for d in sorted(low):
        ws = low[d]
        for p in range(len(ws) - min_span + 1):
            occ.setdefault(tuple(ws[p : p + min_span]), []).append((d, p))
    removable: dict[int, set[int]] = {d: set() for d in toks}
    for places in occ.values():
        if len(places) >= 2:
            for d, p in sorted(places)[1:]:
                removable[d].add(p)
    out = {}
    for d, ws in toks.items():
        covered: set[int] = set()
        for p in removable[d]:
            covered.update(range(p, p + min_span))
        kept = [w for i, w in enumerate(ws) if i not in covered]
        out[d] = (len(ws), len(kept), len(ws) - len(kept), " ".join(kept))
    return out


@SET
@given(
    st.lists(
        st.lists(st.sampled_from("ab"), min_size=0, max_size=10).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=2, max_value=4),
)
def test_suffix_scrub_matches_python_reference(texts, min_span):
    # tiny alphabet + short docs force dense window collisions,
    # within-doc repeats, and overlapping-island coverage — the
    # corner geometry the fixture corpus never produces
    from musicflow_spark.operators.dedup import suffix_span_scrub

    spark = _get_spark()
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_kept"], r["n_removed"], r["clean_text"]
        )
        for r in suffix_span_scrub(df, min_span=min_span).collect()
    }
    assert got == _py_suffix_scrub(dict(rows), min_span)
