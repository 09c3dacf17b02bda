"""Two-process jax.distributed tests over CPU devices.

The reference's only distribution test surface is real SLURM; here the
multi-host semantics are exercised for real with ``jax.distributed`` across
two local processes, each exposing 2 virtual CPU devices (global mesh = 4):

  - ``shard_batch``: per-process local batches must assemble into the global
    batch with DistributedSampler+DDP semantics (round-1 advisor finding:
    device_put silently kept only the local slice),
  - ``gather_metrics``: cross-host averaging,
  - checkpoint saving: process-0-only directory mutation, collective orbax save.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[2]

WORKER = r"""
import sys
import numpy as np

process_id = int(sys.argv[1])
coordinator = sys.argv[2]
out_dir = sys.argv[3]

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.distributed.initialize(
    coordinator_address=coordinator, num_processes=2, process_id=process_id
)
assert jax.process_count() == 2
assert jax.device_count() == 4, jax.device_count()

sys.path.insert(0, {repo!r})
from avex_tpu.parallel import gather_metrics, make_mesh, shard_batch

mesh = make_mesh(data=4, model=1)

# --- shard_batch: local batches -> one global batch ---
local = {{
    "raw_wav": (np.arange(8, dtype=np.float32) + 100 * process_id).reshape(2, 4),
    "label": np.asarray([process_id * 2, process_id * 2 + 1]),
}}
global_batch = shard_batch(local, mesh)
assert global_batch["raw_wav"].shape == (4, 4), global_batch["raw_wav"].shape

# Global reduction must see BOTH processes' contributions.
from jax.sharding import NamedSharding, PartitionSpec as P
total = jax.jit(
    lambda x: jax.numpy.sum(x),
    out_shardings=NamedSharding(mesh, P()),
)(global_batch["raw_wav"])
expected = float(np.arange(8).sum() * 2 + 100 * 8)  # both halves
assert float(total) == expected, (float(total), expected)

# --- gather_metrics: cross-host mean ---
metrics = gather_metrics({{"loss": 1.0 + process_id}})
assert abs(metrics["loss"] - 1.5) < 1e-9, metrics

# --- pipeline parallelism across processes: the model-axis ppermute ring
# crosses the host boundary (each mesh column holds one device per process).
import jax.numpy as jnp
from avex_tpu.parallel.pipeline import pipeline_apply

pmesh = make_mesh(data=2, model=2)
prng = np.random.default_rng(3)
stack = {{
    "w": np.asarray(prng.standard_normal((4, 8, 8)), np.float32) * 0.1,
    "b": np.asarray(prng.standard_normal((4, 8)), np.float32) * 0.1,
}}
px = np.asarray(prng.standard_normal((4, 8)), np.float32)

def _layer(p, h):
    return jnp.tanh(h @ p["w"] + p["b"])

pipe_out = jax.jit(
    lambda pp, xx: pipeline_apply(_layer, pp, xx, mesh=pmesh, num_microbatches=2),
    out_shardings=NamedSharding(pmesh, P()),
)(stack, px)
ref = px
for i in range(4):
    ref = np.tanh(ref @ stack["w"][i] + stack["b"][i])
assert np.allclose(np.asarray(pipe_out), ref, atol=1e-5), "cross-host pipeline diverged"

# --- checkpoint: p0-only dir mutation, collective save ---
from avex_tpu.training.checkpoint import CheckpointManager
manager = CheckpointManager(out_dir)
params = {{"w": np.full((4,), 3.0, np.float32)}}
manager.save("multihost_ckpt", params=params, step=1, epoch=0)

# --- full Trainer epoch across both processes ---
# build_dataloaders shards the dataset per process; shard_batch assembles
# the global batch; epoch metrics sync across hosts; checkpoints save once.
import os as _os
_os.environ["AVEX_TPU_DONATE"] = "0"
from avex_tpu.configs import (
    DatasetCollectionConfig, DatasetConfig, MeshConfig, ModelSpec, RunConfig,
    TrainingParams,
)
from avex_tpu.data import build_dataloaders
from avex_tpu.models.factory import build_model_from_spec
from avex_tpu.training import Trainer

config = RunConfig(
    model_spec=ModelSpec(
        name="beats", pretrained=False,
        init_config={{"encoder_layers": 1, "encoder_embed_dim": 64,
                      "encoder_ffn_embed_dim": 96, "encoder_attention_heads": 4,
                      "embed_dim": 32, "dropout": 0.0, "encoder_layerdrop": 0.0}},
        audio_config={{"representation": "raw", "normalize": False,
                       "target_length_seconds": 0.5, "window_selection": "random"}},
    ),
    training_params=TrainingParams(train_epochs=1, lr=1e-3, batch_size=2),
    dataset_config=DatasetCollectionConfig(
        train_datasets=[DatasetConfig(name="mh", kind="synthetic", num_samples=16,
                                      num_classes=2, clip_seconds=0.5)]
    ),
    output_dir=out_dir + "/train",
    mesh=MeshConfig(data=4, model=1),
    seed=0,
    num_workers=0,
)
train_loader, _v, _t, _lm, num_classes = build_dataloaders(config)
model = build_model_from_spec(config.model_spec, num_classes=num_classes)
trainer = Trainer(model, config, train_loader, mesh=mesh)
result = trainer.train()
epoch_metrics = result["history"][0]["train"]
assert np.isfinite(epoch_metrics["loss"]), epoch_metrics

import json
print(json.dumps({{"process": process_id, "total": float(total),
                   "loss": metrics["loss"],
                   "epoch_loss": round(float(epoch_metrics["loss"]), 6)}}))
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.integration
@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    script = WORKER.format(repo=str(REPO_ROOT))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(pid), coordinator, str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd=str(REPO_ROOT),
        )
        for pid in (0, 1)
    ]
    outs = []
    for proc in procs:
        out, err = proc.communicate(timeout=600)
        outs.append((proc.returncode, out, err))
    import json as _json

    payloads = []
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{err[-4000:]}"
        assert '"loss": 1.5' in out
        payloads.append(_json.loads(out.strip().splitlines()[-1]))
    # the jitted loss is a global value: both hosts must report the same
    # epoch metrics (and the gather keeps them identical post-sync)
    assert payloads[0]["epoch_loss"] == payloads[1]["epoch_loss"]

    # Trainer artifacts written exactly once (process-0 guards)
    train_dir = tmp_path / "train"
    assert (train_dir / "final_model").exists()
    assert (train_dir / "metadata" / "experiment_metadata.csv").exists()

    # exactly one meta.json (process 0), checkpoint restorable
    assert (tmp_path / "multihost_ckpt.meta.json").exists()
    import orbax.checkpoint as ocp

    payload = ocp.StandardCheckpointer().restore(tmp_path / "multihost_ckpt")
    import numpy as np

    np.testing.assert_array_equal(payload["params"]["w"], np.full((4,), 3.0, np.float32))
