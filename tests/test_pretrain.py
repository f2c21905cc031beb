"""--use-pretrain: BPR-MF npz init (reference pretrain-loader parity)."""

import jax
import numpy as np

from kgat_tpu.models import kgat
from kgat_tpu.models.kgat import KGATConfig
from kgat_tpu.train import Trainer
from kgat_tpu.utils.config import TrainConfig


def test_pretrain_rows_placed(tiny_dataset, tmp_path, rng):
    ds = tiny_dataset
    d = 16
    ue = rng.normal(size=(ds.n_users, d)).astype(np.float32)
    ie = rng.normal(size=(ds.n_items, d)).astype(np.float32)
    path = tmp_path / "mf.npz"
    np.savez(path, user_embed=ue, item_embed=ie)

    cfg = TrainConfig(dataset="synthetic", pretrain_path=str(path),
                      log_dir=str(tmp_path), epochs=1, eval_every=1,
                      syn_users=ds.n_users, syn_items=ds.n_items,
                      syn_entities=ds.n_entities,
                      syn_relations=ds.n_relations_kg,
                      model=KGATConfig(embed_dim=d, relation_dim=d,
                                       conv_dims=(d,), mess_dropout=(0.0,)))
    cfg.seed = 7  # match the tiny_dataset fixture's generation seed
    tr = Trainer(cfg, dataset=ds)
    emb = np.asarray(tr.params["entity_embed"])
    np.testing.assert_array_equal(emb[: ds.n_items], ie)
    np.testing.assert_array_equal(
        emb[ds.n_entities: ds.n_entities + ds.n_users], ue)
    # Non-item entities stay randomly initialized (not zero, not pretrain).
    assert np.abs(emb[ds.n_items: ds.n_entities]).sum() > 0


def test_bprmf_pretrainer_end_to_end(tiny_dataset, tmp_path):
    """The in-framework BPR-MF pretrainer must converge and produce an npz
    that --use-pretrain loads verbatim (closing the reference's pretrain
    workflow: SURVEY.md §2.1 pretrain-loader row)."""
    import numpy as np

    from kgat_tpu.models import bprmf, kgat
    from kgat_tpu.models.kgat import KGATConfig

    ds = tiny_dataset
    losses = []
    embeds = bprmf.train_bprmf(ds.cf_train, ds.n_users, ds.n_items,
                               dim=16, epochs=8, batch_size=64,
                               log=lambda e, l: losses.append(l))
    assert losses[-1] < losses[0] < 0.75     # starts near ln2, decreases
    assert embeds["user_embed"].shape == (ds.n_users, 16)
    assert embeds["item_embed"].shape == (ds.n_items, 16)

    path = str(tmp_path / "mf.npz")
    bprmf.save_pretrain(path, embeds)
    z = np.load(path)
    g, meta = ds.build()
    import jax
    params = kgat.init_params(
        jax.random.key(0), meta.n_nodes, meta.n_relations,
        KGATConfig(embed_dim=16, conv_dims=(8,), mess_dropout=(0.1,)),
        pretrain=(z["user_embed"], z["item_embed"], meta.n_entities))
    np.testing.assert_allclose(
        np.asarray(params["entity_embed"][: ds.n_items]), z["item_embed"],
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["entity_embed"][meta.n_entities:
                                          meta.n_entities + ds.n_users]),
        z["user_embed"], atol=1e-6)
