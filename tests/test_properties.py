"""Property-based checks (SURVEY.md §5.2 item 4, via hypothesis):
algebraic invariants of the core operators on generated inputs —
standardization-key idempotence, diff(a,a) emptiness, added/removed
disjointness, union-tag cardinality, R-null-semantics of NOT-IN.

Spark jobs are slow per-example, so each property batches all generated
values into one DataFrame per example and runs few examples.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from artis_data_ingest_spark.functions.strings import standardize_key
from artis_data_ingest_spark.operators.clean import not_in_keep_nulls
from artis_data_ingest_spark.operators.diff import dataset_diff, union_tag

_SETTINGS = dict(max_examples=8, deadline=None)

paths = st.text(
    alphabet=st.characters(
        codec="ascii", categories=("L", "N", "P", "S", "Z")
    ),
    min_size=0,
    max_size=40,
)


@settings(**_SETTINGS)
@given(st.lists(paths, min_size=1, max_size=20))
def test_standardize_key_idempotent(spark, values):
    df = spark.createDataFrame([(v,) for v in values], ["p"])
    out = df.select(
        standardize_key("p").alias("once"),
    ).select(
        "once", standardize_key("once").alias("twice")
    )
    for r in out.collect():
        assert r.once == r.twice


@settings(**_SETTINGS)
@given(st.lists(paths, min_size=1, max_size=20))
def test_standardize_key_is_slug(spark, values):
    # output alphabet is closed: lowercase alnum + underscore only
    import re

    df = spark.createDataFrame([(v,) for v in values], ["p"])
    for r in df.select(standardize_key("p").alias("k")).collect():
        assert re.fullmatch(r"[a-z0-9_]*", r.k), r.k


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 1000), paths), min_size=1, max_size=15
    )
)
def test_dataset_diff_self_is_empty(spark, rows):
    df = spark.createDataFrame(rows, ["id", "name"])
    d = dataset_diff(spark, df, df).collect()[0]
    assert d.row_diff == 0
    assert d.added_cols == [] and d.removed_cols == []
    assert d.type_changes == []


@settings(**_SETTINGS)
@given(
    st.lists(paths, min_size=0, max_size=10),
    st.lists(paths, min_size=0, max_size=10),
)
def test_diff_added_removed_disjoint(spark, old_cols_raw, new_cols_raw):
    # column names must be unique and non-empty; slug-ify raw text
    def mk(names, tag):
        cols = sorted({f"c_{abs(hash(n)) % 997}" for n in names} | {"k"})
        return spark.createDataFrame([(0,) * len(cols)], cols), cols

    old_df, old_cols = mk(old_cols_raw, "o")
    new_df, new_cols = mk(new_cols_raw, "n")
    d = dataset_diff(spark, old_df, new_df).collect()[0]
    assert set(d.added_cols).isdisjoint(d.removed_cols)
    assert set(d.added_cols) == set(new_cols) - set(old_cols)
    assert set(d.removed_cols) == set(old_cols) - set(new_cols)


@settings(**_SETTINGS)
@given(
    st.lists(paths, min_size=0, max_size=12),
    st.lists(paths, min_size=0, max_size=12),
)
def test_union_tag_cardinality(spark, new_vals, old_vals):
    schema = "v string"
    new_df = spark.createDataFrame([(v,) for v in new_vals], schema)
    old_df = spark.createDataFrame([(v,) for v in old_vals], schema)
    out = union_tag(new_df, old_df)
    assert out.count() == len(new_vals) + len(old_vals)
    tags = {r.directory for r in out.select("directory").distinct().collect()}
    assert tags <= {"new", "old"}


@settings(**_SETTINGS)
@given(
    st.lists(st.one_of(st.none(), st.integers(0, 5)), min_size=1, max_size=20),
    st.lists(st.integers(0, 5), min_size=0, max_size=4),
)
def test_not_in_keeps_nulls(spark, values, banned):
    # R semantics (SURVEY.md §4.3): !x %in% set keeps NA rows, unlike
    # SQL NOT IN which drops them
    df = spark.createDataFrame([(v,) for v in values], "x int")
    kept = [r.x for r in df.filter(not_in_keep_nulls("x", banned)).collect()]
    expected = [v for v in values if v is None or v not in banned]
    assert sorted(kept, key=lambda v: (v is None, v)) == sorted(
        expected, key=lambda v: (v is None, v)
    )


texts = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("L", "N", "P", "Z"),
        max_codepoint=0x2FFFF,
    ),
    min_size=0,
    max_size=60,
)


@settings(**_SETTINGS)
@given(st.lists(texts, min_size=2, max_size=12))
def test_encoded_shingles_match_strings_on_unicode(spark, values):
    # the bigint 21-bit-per-codepoint packing must agree with string
    # shingle sets on arbitrary unicode (sizes and pairwise jaccard)
    from artis_data_ingest_spark.operators.dedup import (
        char_shingles,
        encoded_shingles,
        jaccard,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], ["doc_id", "text"]
    )
    a = df.select(
        "doc_id",
        char_shingles("text").alias("cs"),
        encoded_shingles("text").alias("es"),
    )
    assert a.filter(F.size("cs") != F.size("es")).count() == 0
    # jaccard is undefined on empty sets; the operators filter
    # shingle-less docs before any pair work, so the property does too
    a = a.filter(F.size("cs") > 0)
    x = a.select(
        F.col("doc_id").alias("ida"),
        F.col("cs").alias("csa"),
        F.col("es").alias("esa"),
    )
    y = a.select(
        F.col("doc_id").alias("idb"),
        F.col("cs").alias("csb"),
        F.col("es").alias("esb"),
    )
    pairs = x.crossJoin(y).filter(F.col("ida") < F.col("idb"))
    bad = pairs.filter(
        jaccard(F.col("csa"), F.col("csb")).eqNullSafe(
            jaccard(F.col("esa"), F.col("esb"))
        )
        == False  # noqa: E712
    ).count()
    assert bad == 0


@settings(**_SETTINGS)
@given(st.lists(texts, min_size=1, max_size=10))
def test_portable_sig_table_matches_fold_on_unicode(spark, values):
    # the positional codegen signature must equal the array-fold
    # reference on arbitrary unicode text
    import functools
    import operator

    from artis_data_ingest_spark.operators.dedup import (
        char_shingles,
        portable_minhash_sig_table,
        portable_minhash_signature,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], ["doc_id", "text"]
    )
    fold = df.filter(F.length(F.lower("text")) >= 3).select(
        "doc_id",
        portable_minhash_signature(
            char_shingles("text", 3), shingle_len=3
        ).alias("sig"),
    )
    table = portable_minhash_sig_table(df)
    joined = fold.join(table, on="doc_id", how="full_outer")
    bad = joined.filter(
        functools.reduce(
            operator.or_,
            [
                F.element_at("sig", i + 1).eqNullSafe(F.col(f"m{i}"))
                == False  # noqa: E712
                for i in range(8)
            ],
        )
    ).count()
    assert bad == 0


# --- media codec round-trips: any well-formed payload survives ------------
# Pure-Python properties (no Spark job), so examples are cheap.


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    ch=st.sampled_from([3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, ch, seed):
    import numpy as np

    from artis_data_ingest_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(arr)), arr)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(0, 200),
    ch=st.integers(1, 4),
    sr=st.integers(1, 96_000),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, sr, seed):
    import numpy as np

    from artis_data_ingest_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(seed)
    arr = rng.integers(-32768, 32768, size=(n, ch)).astype(np.int16)
    out, got_sr = decode_wav(encode_wav(arr, sr))
    assert got_sr == sr
    assert out.shape == arr.shape
    assert np.array_equal(out, arr)


@settings(max_examples=30, deadline=None)
@given(
    nf=st.integers(1, 6),
    h=st.integers(1, 10),
    w=st.integers(1, 10),
    fps=st.integers(1, 60),
    seed=st.integers(0, 2**31 - 1),
)
def test_avi_roundtrip_property(nf, h, w, fps, seed):
    import numpy as np

    from artis_data_ingest_spark.operators.multimodal import (
        decode_avi,
        encode_avi,
    )

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
    out, got_fps = decode_avi(encode_avi(arr, fps))
    assert got_fps == fps
    assert out.shape == arr.shape
    assert np.array_equal(out, arr)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=64,
        unique=True,
    )
)
def test_zvalue_is_injective_and_bounded(spark, pairs):
    """The Morton key must be a bijection on the 8-bit grid: distinct
    (x, y) pairs get distinct z-values, every z stays within 16 bits,
    and de-interleaving recovers the inputs exactly."""
    from artis_data_ingest_spark.operators.zorder import zvalue

    df = spark.createDataFrame(pairs, "x bigint, y bigint")
    rows = df.select(
        "x", "y", zvalue(F.col("x"), F.col("y"), 8).alias("z")
    ).collect()
    zs = [r.z for r in rows]
    assert len(set(zs)) == len(pairs)
    for r in rows:
        assert 0 <= r.z < (1 << 16)
        # python-side de-interleave is the independent reference
        x = sum(((r.z >> (2 * i)) & 1) << i for i in range(8))
        y = sum(((r.z >> (2 * i + 1)) & 1) << i for i in range(8))
        assert (x, y) == (r.x, r.y)


def test_bpe_encoding_splits_bmp_unicode_by_codepoint(spark):
    """The BPE trainer's only regex-dependent step — the '(.)' initial
    character split — must produce exactly Python's list(word) for BMP
    text (accented Latin, CJK, Cyrillic). Astral-plane characters
    (surrogate pairs) are a documented caveat of Java-regex '.';
    byte-level BPE is the production answer for those corpora."""
    from artis_data_ingest_spark.plans.retrieval import _BPE_SEP

    sep2 = _BPE_SEP + _BPE_SEP
    words = ["café", "naïve", "日本語モデル", "привет", "mixed日本x"]
    df = spark.createDataFrame([(w,) for w in words], ["word"])
    enc = F.concat(
        F.lit(sep2), F.regexp_replace("word", "(.)", "$1" + sep2)
    )
    syms_col = F.filter(F.split(enc, sep2), lambda x: x != "")
    got = {
        r.word: list(r.s)
        for r in df.select("word", syms_col.alias("s")).collect()
    }
    for w in words:
        assert got[w] == list(w), w


@settings(**_SETTINGS)
@given(st.integers(min_value=2, max_value=5))
def test_index_partial_merge_identity_any_split(spark, k):
    """The algebraic index-merge identity must hold for ANY disjoint
    k-way split of the corpus, not just the base/delta bisection the
    registered query uses: merging k partial indexes equals the
    one-shot full build row-for-row."""
    from functools import reduce

    from artis_data_ingest_spark.plans.retrieval import (
        merge_indexes,
        partial_index,
    )
    from artis_data_ingest_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(
        120
    )
    parts = [
        partial_index(docs.filter(F.col("doc_id") % k == i))
        for i in range(k)
    ]
    merged = reduce(merge_indexes, parts)
    want = partial_index(docs)
    key = lambda r: (r.term, r.df, r.total_tf, tuple(r.plist))  # noqa: E731
    assert sorted(map(key, merged.collect())) == sorted(
        map(key, want.collect())
    )


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_pagerank_matches_pure_python_reference(spark, raw_edges):
    """The distributed integer PageRank must reproduce a sequential
    pure-Python implementation of the same fixed-point recurrence on
    arbitrary small weighted digraphs (self-loops and parallel edges
    included — parallel edges sum their weights)."""
    from collections import defaultdict

    from artis_data_ingest_spark.operators.graphs import PR_SCALE, pagerank

    w = defaultdict(int)
    for a, b, c in raw_edges:
        w[(a, b)] += c
    nodes = sorted({a for a, _ in w} | {b for _, b in w})
    ow = defaultdict(int)
    for (a, _), c in w.items():
        ow[a] += c
    n = len(nodes)
    base = (15 * PR_SCALE) // (100 * n)
    pr = {v: PR_SCALE // n for v in nodes}
    for _ in range(4):
        s = defaultdict(int)
        for (a, b), c in w.items():
            q, r = divmod(pr[a], ow[a])
            s[b] += q * c + (r * c) // ow[a]
        pr = {v: base + (85 * s[v]) // 100 for v in nodes}

    edges = spark.createDataFrame(
        [(a, b, c) for (a, b), c in w.items()], "src long, dst long, w long"
    )
    got = {
        r.node: r.pr for r in pagerank(edges, n_iter=4).collect()
    }
    assert got == pr


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.sampled_from([1, 3]),
)
def test_jpeg_flat_roundtrip_property(h, w, seed, channels):
    """Pure-codec property (no Spark): ANY uint8 image of ANY size
    round-trips through flat-quant baseline JPEG within 1 LSB for
    grayscale (DCT float rounding) / 4 LSB for color (adds the
    RGB<->YCbCr double rounding), with exact shape (pad then crop)."""
    import numpy as np

    from artis_data_ingest_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    shape = (h, w) if channels == 1 else (h, w, 3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant="flat"))
    assert out.shape == img.shape
    tol = 1 if channels == 1 else 4
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= tol


@settings(**_SETTINGS)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8",
                categories=("L", "N", "P", "Z", "M"),
                max_codepoint=0x2FFF,
            ),
            min_size=0,
            max_size=30,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_unicode_canon_idempotent_and_nfc_invariant(spark, values):
    """canon(canon(x)) == canon(x), and canon is invariant under any
    prior NFC/NFD normalization of the input — the property that makes
    it a dedup KEY (equal canonical text ⇒ equal key, regardless of
    which normal form the crawler emitted)."""
    import unicodedata

    from artis_data_ingest_spark.functions.strings import unicode_canon

    rows = [
        (v, unicodedata.normalize("NFD", v), unicodedata.normalize("NFC", v))
        for v in values
    ]
    df = spark.createDataFrame(rows, ["raw", "nfd", "nfc"])
    out = df.select(
        unicode_canon("raw").alias("c_raw"),
        unicode_canon("nfd").alias("c_nfd"),
        unicode_canon("nfc").alias("c_nfc"),
    ).select(
        "c_raw", "c_nfd", "c_nfc",
        unicode_canon("c_raw").alias("c_twice"),
    )
    for r in out.collect():
        assert r.c_raw == r.c_nfd == r.c_nfc  # form-invariance
        assert r.c_raw == r.c_twice  # idempotence


@settings(**_SETTINGS)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="ascii", categories=("L", "N", "P", "Z")
            ),
            min_size=0,
            max_size=60,
        ).map(lambda s: s.replace("\r", " ")),
        min_size=1,
        max_size=10,
    )
)
def test_boilerplate_strip_identity_when_threshold_unreachable(spark, texts):
    """With max_df_ratio > 1 no line can ever be boilerplate, so the
    operator must be a pure split→reassemble identity: every document
    comes back byte-equal with n_lines_removed == 0 — pinning position
    ordering, empty-line handling, and the collect_list reassembly on
    arbitrary content."""
    from artis_data_ingest_spark.operators.clean import (
        strip_boilerplate_lines,
    )

    docs = spark.createDataFrame(
        [(i, "src", "\n".join([t, f"tail {i}"]) if t else f"only {i}")
         for i, t in enumerate(texts)],
        ["doc_id", "source", "text"],
    )
    inp = {r.doc_id: r.text for r in docs.collect()}
    out = {
        r.doc_id: (r.text, r.n_lines_removed)
        for r in strip_boilerplate_lines(docs, max_df_ratio=2.0).collect()
    }
    assert out == {i: (t, 0) for i, t in inp.items()}


def _qlog2_ref(x, B=20, P=28):
    e = x.bit_length() - 1
    t = (x << P) >> e
    f = 0
    for _ in range(B):
        u = t * t
        b = 1 if u >= 1 << (2 * P + 1) else 0
        t = u >> (P + b)
        f = f * 2 + b
    return e * (1 << B) + f


@given(
    xs=st.lists(
        st.integers(min_value=1, max_value=2**34), min_size=1, max_size=40
    )
)
@settings(max_examples=15, deadline=None)
def test_qlog2_matches_python_reference_and_error_bound(spark, xs):
    """The fixed-point log2 behind the LM perplexity filter: Spark's
    unrolled withColumn chain must equal the pure-Python recurrence
    bit-for-bit on arbitrary inputs, stay monotone, and sit within
    2^-18 of true log2 (the approximation-quality contract)."""
    import math

    from artis_data_ingest_spark.functions.numeric import with_qlog2

    df = spark.createDataFrame([(int(x),) for x in xs], "x bigint")
    got = {r.x: r.q for r in with_qlog2(df, "x", "q").collect()}
    for x in set(xs):
        assert got[x] == _qlog2_ref(x)
        assert abs(got[x] / 2**20 - math.log2(x)) < 2**-18
    srt = sorted(set(xs))
    qs = [got[x] for x in srt]
    assert all(a <= b for a, b in zip(qs, qs[1:]))


def test_lm_perplexity_key_tracks_true_float_perplexity(spark):
    """The exact integer score key is an APPROXIMATION of true float
    log2-perplexity — pin the error bound (and therefore that the
    bucketing semantics match what a float implementation would do):
    per-doc |key/2^26 - true| < 1e-4 on a real corpus slice."""
    import math

    from artis_data_ingest_spark.operators.lm import lm_perplexity_buckets
    from artis_data_ingest_spark.functions.textstats import WS_RE
    import re

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(80)
    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    out = {r.doc_id: r for r in lm_perplexity_buckets(docs).collect()}

    tok = lambda t: [w.lower() for w in re.split(WS_RE, t.strip()) if w]
    train = [t for i, t in rows if i % 10 == 0]
    counts = {}
    for t in train:
        for w in tok(t):
            counts[w] = counts.get(w, 0) + 1
    T = sum(counts.values())
    V = len(counts) + 1
    den = T + V
    for i, t in rows:
        if i % 10 == 0 or i not in out:
            continue
        ws = tok(t)
        if not ws:
            continue
        true = math.log2(den) - sum(
            math.log2(counts.get(w, 0) + 1) for w in ws
        ) / len(ws)
        assert abs(out[i].log2_ppl - true) < 1e-4, (i, out[i].log2_ppl, true)


@given(payload=st.binary(min_size=0, max_size=400))
@settings(max_examples=60, deadline=None)
def test_jpeg_decoder_fails_closed_on_garbage(payload):
    """decode_jpeg on arbitrary bytes must raise (any exception — the
    image_stats except-clause is deliberately broad) or return a valid
    array; it must never hang or corrupt state.  Prefixing SOI forces
    the marker walk to actually run."""
    import numpy as np

    from artis_data_ingest_spark.operators.jpeg import decode_jpeg

    for blob in (payload, b"\xff\xd8" + payload):
        try:
            out = decode_jpeg(blob)
        except Exception:
            continue
        assert isinstance(out, np.ndarray) and out.dtype == np.uint8


_PRUNE_OPS = {
    "=": lambda a, b: a == b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
}


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(st.integers(-50, 50), min_size=1, max_size=40),
    op=st.sampled_from(["=", "<", "<=", ">", ">="]),
    pivot=st.integers(-60, 60),
    clustered=st.booleans(),
)
def test_versioned_prune_is_sound(
    spark, tmp_path_factory, vals, op, pivot, clustered
):
    """File skipping must be SOUND under any data/filter combination:
    a stats- (and for '=' bloom-) pruned scan returns exactly the rows
    a full read + filter would — pruning may keep too much, never drop
    a matching row.  Covers duplicates, negatives, empty-result
    filters, clustered and unclustered layouts."""
    from artis_data_ingest_spark.sinks.versioned import commit, scan

    tdir = str(tmp_path_factory.mktemp("vtprop") / "tbl")
    df = spark.createDataFrame(
        [(v,) for v in vals], "k int"
    ).repartition(3)
    commit(
        df, tdir, mode="overwrite", expect_version=None,
        cluster_by=["k"] if clustered else None, n_files=3,
        bloom_cols=["k"],
    )
    expect = sorted(v for v in vals if _PRUNE_OPS[op](v, pivot))
    got = sorted(
        r.k for r in scan(spark, tdir, [("k", op, pivot)]).collect()
    )
    assert got == expect


# --- round-14 codec properties (pure-Python, no Spark per example) ----------


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.one_of(st.none(), st.text(max_size=30)),
            st.one_of(st.none(),
                      st.floats(allow_nan=False, allow_infinity=False)),
            st.lists(st.one_of(st.none(),
                               st.integers(-(2**31), 2**31 - 1)),
                     max_size=5),
            st.binary(max_size=20),
        ),
        min_size=0,
        max_size=12,
    ),
    st.sampled_from(["null", "deflate", "bzip2", "xz"]),
)
def test_avro_roundtrip_property(rows, codec):
    """encode_ocf ∘ decode_ocf is the identity on any value set the
    schema admits, for every supported codec."""
    from pyspark.sql import types as T

    from artis_data_ingest_spark.sources.avro_ocf import (
        decode_ocf,
        encode_ocf,
    )

    schema = T.StructType([
        T.StructField("i", T.LongType(), False),
        T.StructField("s", T.StringType(), True),
        T.StructField("d", T.DoubleType(), True),
        T.StructField("xs", T.ArrayType(T.IntegerType(), True), True),
        T.StructField("b", T.BinaryType(), False),
    ])
    dicts = [
        {"i": i, "s": s, "d": d, "xs": xs, "b": b}
        for i, s, d, xs, b in rows
    ]
    _, back = decode_ocf(
        encode_ocf(dicts, schema, codec=codec, rows_per_block=3)
    )
    assert back == dicts


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(0, 15), min_size=8, max_size=64).filter(
        lambda xs: len(xs) % 8 == 0
    ),
    st.integers(-32768, 32767),
    st.integers(0, 88),
)
def test_ima_adpcm_matches_mirror_property(nibs, pred, idx):
    """The vectorized IMA decoder equals the scalar spec recurrence
    on arbitrary nibble streams and initial state."""
    import numpy as np

    from artis_data_ingest_spark.operators.multimodal import (
        decode_wav,
        encode_wav_ima_raw,
    )
    from tests.test_multimodal import _ima_mirror

    arr = np.array([nibs], dtype=np.uint8)
    samples, _ = decode_wav(
        encode_wav_ima_raw(arr, np.array([pred]), np.array([idx]),
                           8000)
    )
    assert list(samples[:, 0]) == _ima_mirror(nibs, pred, idx)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 12),
    st.integers(1, 12),
    st.sampled_from([(0, 1), (0, 2), (0, 4), (0, 8), (0, 16),
                     (2, 8), (2, 16), (4, 8), (6, 8)]),
    st.booleans(),
    st.randoms(use_true_random=False),
)
def test_png_fullspec_roundtrip_property(w, h, cfg, interlace, rnd):
    """_encode_png_raw ∘ decode_png maps native samples to the
    documented 8-bit expansion for every (color, depth, interlace)
    combo the decoder claims."""
    import numpy as np

    from artis_data_ingest_spark.operators.multimodal import (
        _PNG_RAW_CH,
        _encode_png_raw,
        decode_png,
    )

    color, depth = cfg
    ch = _PNG_RAW_CH[color]
    maxv = (1 << depth) - 1
    native = np.array(
        [[[rnd.randint(0, maxv) for _ in range(ch)]
          for _ in range(w)] for _ in range(h)]
    )
    img = decode_png(
        _encode_png_raw(native, depth, color, interlace=int(interlace))
    )
    if depth == 16:
        expect = (native >> 8).astype(np.uint8)
    else:
        expect = (native * 255 // maxv).astype(np.uint8)
    if color == 0:
        assert (img == np.repeat(expect, 3, axis=2)).all()
    elif color == 4:
        assert (img[:, :, :3] ==
                np.repeat(expect[:, :, :1], 3, axis=2)).all()
        assert (img[:, :, 3] == expect[:, :, 1]).all()
    else:
        assert (img == expect).all()


@settings(max_examples=20, deadline=None)
@given(
    st.integers(1, 2),
    st.integers(60, 400),
    st.booleans(),
    st.randoms(use_true_random=False),
)
def test_flac_roundtrip_property(ch, n, ms, rnd):
    """decode ∘ encode is the identity on arbitrary int16 signals —
    lossless means LOSSLESS, and the STREAMINFO MD5 gate rides along
    on every decode."""
    import numpy as np

    from artis_data_ingest_spark.operators.flac import (
        decode_flac,
        encode_flac,
    )

    x = np.array(
        [[rnd.randint(-32768, 32767) for _ in range(ch)]
         for _ in range(n)],
        dtype=np.int16,
    )
    y, sr = decode_flac(
        encode_flac(x, 16000, block_size=128,
                    mid_side=(ms and ch == 2))
    )
    assert sr == 16000 and (y == x).all()


def test_md5_word_a_matches_hashlib():
    """r16: the vectorized single-block MD5 behind span_corrupt's mask
    must be bit-identical to hashlib over the exact message shape the
    query hashes ("<doc_id>:<pos>"), including boundary ids."""
    import hashlib
    import random

    import numpy as np

    from artis_data_ingest_spark.plans.pretrain import _md5_word_a

    rng = random.Random(42)
    msgs = [b"0:0", f"{2**63 - 1}:{10**9}".encode()]
    for _ in range(500):
        msgs.append(
            f"{rng.randrange(2**63)}:{rng.randrange(10**9)}".encode()
        )
    arr = np.array(msgs, dtype="S48")
    got = _md5_word_a(arr)
    for i, m in enumerate(msgs):
        want = int.from_bytes(hashlib.md5(m).digest()[:4], "little")
        assert int(got[i]) == want, m
