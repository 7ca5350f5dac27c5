"""Graceful preemption (train.GracefulShutdown) — beyond reference.

The reference's recovery story is manual wandb restore
(/root/reference/tld/train.py:92-100). Here SIGTERM/SIGINT finish the
in-flight step, write a normal resumable checkpoint, and return cleanly;
`from_scratch=False` continues from it. Tested with a real subprocess
and a real signal.
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = """
import os, sys
sys.path.insert(0, {repo!r})
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from transformer_latent_diffusion_tpu.configs import (
    DataConfig, DenoiserConfig, ModelConfig, TrainConfig, VaeConfig)
from transformer_latent_diffusion_tpu.train import main

tmp = {tmp!r}
N = 64
np.save(tmp + "/latents.npy", np.random.randn(N, 4, 8, 8).astype("float32"))
np.save(tmp + "/text_emb.npy", np.random.randn(N, 768).astype("float32"))
np.save(tmp + "/val_emb.npy", np.random.randn(8, 768).astype("float32"))
r = main(ModelConfig(
    data_config=DataConfig(tmp + "/latents.npy", tmp + "/text_emb.npy",
                           tmp + "/val_emb.npy"),
    denoiser_config=DenoiserConfig(image_size=8, embed_dim=64, n_layers=2,
                                   noise_embed_dims=64),
    train_config=TrainConfig(n_epoch=10000, batch_size=32, save_model=True,
                             save_and_eval_every_iters=10**9,
                             use_wandb=False, checkpoint_dir=tmp + "/ckpts"),
    vae_cfg=VaeConfig(block_out_channels=(8, 16), layers_per_block=1),
))
print("RESULT preempted=%s step=%d" % (r["preempted"], r["global_step"]),
      flush=True)
"""


def test_sigterm_checkpoints_and_resumes(tmp_path):
    script = tmp_path / "runner.py"
    script.write_text(_RUNNER.format(tmp=str(tmp_path), repo=_REPO))
    env = dict(os.environ, PYTHONUNBUFFERED="1")
    proc = subprocess.Popen(
        [sys.executable, str(script)], cwd=_REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)

    # wait until training is demonstrably stepping (a few epochs in),
    # then deliver a real SIGTERM
    lines = []
    deadline = time.time() + 900
    for line in proc.stdout:
        lines.append(line)
        if line.startswith("epoch: 4"):
            break
        assert time.time() < deadline, "".join(lines)
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=300)
    lines.append(out)
    text = "".join(lines)
    assert proc.returncode == 0, text
    assert "preemption signal received" in text, text
    assert "preemption checkpoint saved" in text, text
    result = [ln for ln in text.splitlines() if ln.startswith("RESULT")][-1]
    assert "preempted=True" in result
    saved_step = int(result.split("step=")[1])
    assert saved_step >= 6  # past epoch 3 (2 steps/epoch)

    # resume from the preemption checkpoint and keep counting steps
    from tests.test_training import _model_cfg
    from transformer_latent_diffusion_tpu.train import main

    cfg = _model_cfg(tmp_path, denoiser=None, img_size=8, n_epoch=1,
                     from_scratch=False, save_model=False)
    # the subprocess wrote under <tmp>/ckpts/model with the default
    # 8px denoiser; reuse the same dirs/config
    cfg.denoiser_config = type(cfg.denoiser_config)(
        image_size=8, embed_dim=64, n_layers=2, noise_embed_dims=64)
    cfg.train_config.checkpoint_dir = str(tmp_path / "ckpts")
    r2 = main(cfg)
    assert not r2["preempted"]
    assert r2["global_step"] >= saved_step + 2, (
        r2["global_step"], saved_step)
    assert all(np.isfinite(r2["losses"]))
