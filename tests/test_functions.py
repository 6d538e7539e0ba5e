"""Unit tests (no Ray) for the text/dedup/similarity/multimodal batch
functions — the stage bodies the pipelines compose."""

import numpy as np
import pyarrow as pa

from weakscraper_ray.functions.dedup import (
    HyperplaneLSH,
    MinHasher,
    SimHasher,
    bucket_pairs,
    content_hash_batch,
    cosine_pairs_in_bucket,
    explode_bands,
    first_per_group,
    hamming64,
    jaccard,
)
from weakscraper_ray.functions.multimodal import (
    FrameSampler,
    MediaFeaturizer,
    make_media_table,
)
from weakscraper_ray.functions.text import (
    LangId,
    QualityScore,
    fingerprint_batch,
    rolling_fingerprint_batch,
    subword_count_batch,
    token_count_batch,
)


def _docs(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts)})


# ------------------------------------------------------------------ text

def test_token_and_subword_counts():
    t = token_count_batch(_docs(["a b  c", "", "one two"]))
    assert t.column("n_tokens").to_pylist() == [3, 0, 2]
    s = subword_count_batch(_docs(["hello, world42!"]))
    # hello , world 42 !  -> 5 pieces
    assert s.column("n_subwords").to_pylist() == [5]


def test_fingerprints_deterministic():
    a = fingerprint_batch(_docs(["x", "y"]))
    b = fingerprint_batch(_docs(["x", "y"]))
    assert a.equals(b)
    assert len(a.column("fp")[0].as_py()) == 32
    r1 = rolling_fingerprint_batch(_docs(["some longer document text here"]))
    r2 = rolling_fingerprint_batch(_docs(["some longer document text here"]))
    assert r1.equals(r2)
    # appending text only ADDS windows, so the min can only stay or drop
    base = rolling_fingerprint_batch(_docs(["abcdefghij" * 10]))
    appended = rolling_fingerprint_batch(_docs(["abcdefghij" * 10 + " tail"]))
    assert (
        appended.column("min_rolling_hash")[0].as_py()
        <= base.column("min_rolling_hash")[0].as_py()
    )


def test_lang_id_heuristic():
    li = LangId()
    out = li(_docs([
        "the cat and the dog in a house",
        "der Hund und die Katze ist nicht da",
        "le chat est dans la maison pour un moment",
        "你好 世界",
        "zzz qqq",
    ]))
    assert out.column("lang_pred").to_pylist() == ["en", "de", "fr", "zh", "und"]


def test_quality_score_ranges():
    qs = QualityScore()
    out = qs(_docs(["The quick brown fox jumps over the lazy dog.", "!!!", ""]))
    scores = out.column("quality_score_e6").to_pylist()
    assert all(0 <= s <= 1_000_000 for s in scores)
    assert scores[0] > scores[1]


# ----------------------------------------------------------------- dedup

def test_exact_dedup_primitives():
    batch = content_hash_batch(_docs(["same", "same", "other"]))
    hashes = batch.column("content_hash").to_pylist()
    assert hashes[0] == hashes[1] != hashes[2]
    grp = batch.filter(pa.array([True, True, False]))
    assert first_per_group(grp).column("doc_id").to_pylist() == [0]


def test_minhash_similar_docs_collide():
    mh = MinHasher(n_hashes=64, shingle_k=1)
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy dog again and again tonight"
    c = "completely unrelated words about database shuffles and actors"
    sa, sb, sc = mh.signature(a), mh.signature(b), mh.signature(c)
    sim_ab = (sa == sb).mean()
    sim_ac = (sa == sc).mean()
    assert sim_ab > 0.6 > sim_ac
    # jaccard estimate roughly matches the true jaccard
    true = jaccard(a, b)
    assert abs(sim_ab - true) < 0.25


def test_explode_bands_and_pairs():
    mh = MinHasher(n_hashes=64)
    tbl = mh(_docs(["same text here", "same text here", "different stuff"]))
    bands = explode_bands(n_bands=16)(tbl)
    assert bands.num_rows == 3 * 16
    # identical docs share every band hash
    df = bands.to_pandas()
    h0 = df[df.doc_id == 0].sort_values("band")["band_hash"].to_numpy()
    h1 = df[df.doc_id == 1].sort_values("band")["band_hash"].to_numpy()
    assert (h0 == h1).all()
    pairs = bucket_pairs(pa.table({"doc_id": pa.array([3, 1, 2], pa.int64())}))
    assert pairs.to_pydict() == {"doc_a": [1, 1, 2], "doc_b": [2, 3, 3]}


def test_simhash_hamming():
    sh = SimHasher()
    t = sh(_docs(["aa bb cc dd ee", "aa bb cc dd ff", "zz yy xx ww vv"]))
    sigs = np.array(t.column("simhash").to_pylist(), dtype=np.uint64)
    d01 = hamming64(sigs[:1], sigs[1:2])[0]
    d02 = hamming64(sigs[:1], sigs[2:3])[0]
    assert d01 < d02


def test_embedding_lsh_and_cosine_pairs():
    rng = np.random.RandomState(0)
    base = rng.randn(64).astype(np.float32)
    near = base + rng.randn(64).astype(np.float32) * 0.01
    far = rng.randn(64).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([list(base), list(near), list(far)],
                              pa.list_(pa.float32(), 64)),
    })
    lsh = HyperplaneLSH(n_bits=8)
    out = lsh(tbl)
    buckets = out.column("bucket").to_pylist()
    assert buckets[0] == buckets[1]  # near-identical vectors collide
    pairs = cosine_pairs_in_bucket(out, threshold=0.99)
    assert (pairs.column("vec_a").to_pylist(), pairs.column("vec_b").to_pylist()) == ([0], [1])


# ------------------------------------------------------------ multimodal

def test_media_featurizer_shapes():
    tbl = make_media_table(12)
    feats = MediaFeaturizer(feature_dim=32)(tbl)
    assert feats.num_rows == 12
    assert len(feats.column("feature")[0].as_py()) == 32
    # deterministic in the payload
    again = MediaFeaturizer(feature_dim=32)(tbl)
    assert feats.equals(again)


def test_frame_sampler_only_videos():
    tbl = make_media_table(12)
    frames = FrameSampler(fps_divisor=10)(tbl)
    media_types = {m["media_type"] for m in tbl.column("meta").to_pylist()}
    assert "video" in media_types
    assert frames.num_rows >= 1
    # every emitted row is from a video id (ids ≡ 2 mod 3 in the fake table)
    assert all(mid % 3 == 2 for mid in frames.column("media_id").to_pylist())


# -------------------------------------------------------------- registry

def test_template_registry_lazy(tmp_path):
    from weakscraper_ray.state import TemplateRegistry, load_template_dir

    (tmp_path / "a.html").write_text("<p wp-name='x'></p>")
    (tmp_path / "b.html").write_text("<div wp-name='y'></div>")
    sources = load_template_dir(str(tmp_path))
    assert set(sources) == {"a", "b"}
    reg = TemplateRegistry(sources)
    assert reg.compiled_count == 0
    assert reg.get("a").match("<p>hi</p>").fields == {"x": "hi"}
    assert reg.compiled_count == 1
    reg.get("a")  # cached, not recompiled
    assert reg.compiled_count == 1


# --------------------------------------------------------- heuristic

def test_heuristic_main_content():
    from weakscraper_ray.heuristic import extract_main_content

    html = """
    <html><body>
      <nav><a href='/'>Home</a><a href='/a'>About</a><a href='/c'>Contact</a></nav>
      <div class='content'>
        <p>This is the real article body with quite a lot of meaningful
           prose text that should clearly dominate the density score.</p>
        <p>Another long paragraph of genuine content keeps the density
           high and the link ratio low for this container element.</p>
      </div>
      <footer>copyright links <a href='/t'>terms</a></footer>
    </body></html>
    """
    text, boiler = extract_main_content(html)
    assert "real article body" in text
    assert "Home" not in text and "copyright" not in text
    assert boiler > 0


def test_heuristic_empty_and_linkfarm():
    from weakscraper_ray.heuristic import extract_main_content

    assert extract_main_content("")[0] == ""
    linkfarm = "<div>" + "".join(f"<a href='/{i}'>link {i}</a>" for i in range(30)) + "</div>"
    text, _ = extract_main_content(linkfarm)
    assert text == ""  # link-dominated page has no main content


# ------------------------------------------------------------ layout

def test_pdf_layout_stub():
    from weakscraper_ray.functions.layout import (
        PdfLayoutParser,
        make_pdf_table,
        reading_order,
    )

    tbl = make_pdf_table(8)
    blocks = PdfLayoutParser()(tbl)
    assert blocks.num_rows > 8
    assert set(blocks.column("kind").to_pylist()) <= {"heading", "paragraph", "caption"}
    # deterministic
    assert blocks.equals(PdfLayoutParser()(tbl))
    df = blocks.to_pandas()
    one = reading_order(df[df.doc_id == 0])
    assert list(one["reading_idx"]) == list(range(len(one)))
