"""Native (C++) host tooling vs numpy fallbacks — identical outputs."""

import numpy as np
import pytest

native = pytest.importorskip("kgat_tpu.native")


def test_parse_user_items_matches_python(tmp_path):
    p = tmp_path / "train.txt"
    p.write_text("0 5 7 9\n1 2\n\n2 0 1 3 4\n17 3\n")
    got = native.parse_user_items(str(p))
    # python fallback
    import kgat_tpu.data as d
    saved = d._native_parse
    d._native_parse = None
    try:
        want = d._parse_user_items(str(p))
    finally:
        d._native_parse = saved
    np.testing.assert_array_equal(got, want)


def test_parse_triples(tmp_path):
    p = tmp_path / "kg_final.txt"
    p.write_text("1 0 2\n3 1 4\n5 2 6\n")
    got = native.parse_triples(str(p))
    np.testing.assert_array_equal(got, [[1, 0, 2], [3, 1, 4], [5, 2, 6]])


def test_sort_and_csr_match_numpy(rng):
    keys = rng.integers(0, 777, 100_000).astype(np.int32)
    perm = native.sort_perm(keys, 777)
    np.testing.assert_array_equal(perm, np.argsort(keys, kind="stable"))
    offs = native.csr_offsets(keys[perm], 777)
    np.testing.assert_array_equal(
        offs, np.searchsorted(keys[perm], np.arange(778)))


def test_save_load_roundtrip(tmp_path, rng):
    from kgat_tpu.data import load_dataset, save_dataset, synthetic_dataset
    ds = synthetic_dataset(seed=4, n_users=60, n_items=50, n_entities=90,
                           n_relations_kg=4, n_interactions=600,
                           n_triples=400)
    save_dataset(ds, str(tmp_path))
    ds2 = load_dataset(str(tmp_path), "synthetic")
    assert (ds2.n_users, ds2.n_items) == (ds.n_users, ds.n_items)
    tr1 = {u: set(v.tolist()) for u, v in ds.train_user_dict.items()}
    tr2 = {u: set(v.tolist()) for u, v in ds2.train_user_dict.items()}
    assert tr1 == tr2
    np.testing.assert_array_equal(np.sort(ds2.kg_triples, axis=0),
                                  np.sort(ds.kg_triples, axis=0))


def test_aligned_fill_matches_numpy(monkeypatch):
    """The C++ aligned-layout fill must be bit-identical to the numpy
    path (same gather/node/seg/bounds/chunk_block), incl. forced chunks."""
    import numpy as np

    import kgat_tpu.graph as G

    rng = np.random.default_rng(11)
    n_nodes, n_edges = 300, 2500
    seg = np.sort(rng.integers(0, n_nodes, n_edges)).astype(np.int64)
    other = rng.integers(0, 500, n_edges).astype(np.int64)

    def build(native: bool, force=None):
        if not native:
            monkeypatch.setattr(G, "_native", None)
        else:
            monkeypatch.undo()
        return G._build_aligned_layout(seg, other, n_nodes, n_edges,
                                       force_chunks=force, chunk_edges=256)

    for force in (None, 64):
        a = build(True, force)
        b = build(False, force)
        assert (a.n_chunks, a.n_blocks, a.chunk_edges) == \
            (b.n_chunks, b.n_blocks, b.chunk_edges)
        for f in ("gather", "node", "seg", "bounds", "chunk_block"):
            np.testing.assert_array_equal(
                np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
                err_msg=f"{f} force={force}")
