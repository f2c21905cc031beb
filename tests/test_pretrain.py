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
