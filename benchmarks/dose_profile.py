"""DOSE epoch machinery on the real chip: selection -> device view build ->
bake, plus one train step. Times the epoch-update path that used to round-trip
selection output to the host and re-upload O(|E|) scale vectors. Diagnostics
only.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from inductive_recommendation_tpu.data.dataset import quick_synthetic_dataset
from inductive_recommendation_tpu.models import get_model
from inductive_recommendation_tpu.train.trainer import get_trainer


def sync(x=None):
    import jax.numpy as jnp

    if x is None:
        x = jax.device_put(0.0)
    float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def main():
    ds = quick_synthetic_dataset(29858, 40981, 1_200_000, seed=0)
    model = get_model(
        {
            "name": "DOSE_aug",
            "embedding_size": 64,
            "n_layers": 3,
            "dropout": 0.3,
            "feature_ratio": 1.0,
            "aug_num": 200_000,
        },
        ds,
    )
    trainer = get_trainer(
        {
            "name": "DOSEaugTrainer",
            "optimizer": "Adam",
            "lr": 1e-3,
            "l2_reg": 1e-4,
            "aux_reg": 0.01,
            "contrastive_reg": 0.1,
            "n_epochs": 1,
            "batch_size": 2048,
            "test_batch_size": 512,
            "topks": [20],
            "device": "tpu",
        },
        ds,
        model,
    )

    def one_step():
        trainer.params, trainer.opt_state, loss = trainer._step(
            trainer.params,
            trainer.opt_state,
            model.buffers,
            trainer.sampler,
            trainer.aux_sampler,
            trainer._next_seed(),
        )
        return loss

    # warm: one step + one full epoch update (compiles everything)
    t0 = time.perf_counter()
    loss = one_step()
    sync(loss)
    print(f"first step (compile):     {time.perf_counter()-t0:8.1f} s", file=sys.stderr)

    t0 = time.perf_counter()
    model.feat_mat_anneal()
    model.update_aug_adj(trainer.params)
    sync(model.buffers["aug_adj"].base.fwd.buckets[0].val)
    print(f"epoch update (compile):   {time.perf_counter()-t0:8.1f} s", file=sys.stderr)

    # warm steps
    for _ in range(3):
        loss = one_step()
    sync(loss)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        loss = one_step()
    sync(loss)
    step_ms = (time.perf_counter() - t0) / n * 1e3
    print(f"train step (warm):        {step_ms:8.2f} ms", file=sys.stderr)

    # warm epoch update: anneal + cos selection + device view + bake
    t0 = time.perf_counter()
    model.feat_mat_anneal()
    model.update_aug_adj(trainer.params)
    sync(model.buffers["aug_adj"].base.fwd.buckets[0].val)
    upd_s = time.perf_counter() - t0
    print(f"epoch update (warm):      {upd_s*1e3:8.1f} ms", file=sys.stderr)

    # a full warm 10-step epoch equivalent
    total = upd_s + n * step_ms / 1e3
    print(
        f"warm epoch (10 steps + update): {total:6.2f} s "
        f"(examples/s {10*2048/total:,.0f})",
        file=sys.stderr,
    )
    print(f"devices: {jax.devices()}", file=sys.stderr)


if __name__ == "__main__":
    main()
