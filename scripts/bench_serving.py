"""Serving throughput: sequential batch-1 requests vs the micro-batcher.

Simulates N concurrent single-image HTTP requests against the flagship
101M model (random weights; compute cost is identical to trained ones)
and reports imgs/sec and per-request latency for
  (a) the reference serving model: one request at a time, and
  (b) serve.batcher.MicroBatcher coalescing them into one scan call.

--editing benches concurrent img2img requests instead (same strength →
one batcher group; round-4 coalescing, VERDICT r3 #8): per-request VAE
encodes happen in the calling threads, the denoise scans coalesce.

--burst benches backpressure (VERDICT r4 #4): a one-shot burst of 4x
the device batch capacity, bounded queue vs unbounded. The bounded run
sheds the overflow instantly with QueueFull (the HTTP frontends turn
that into 503 + Retry-After) and keeps the p99 of ACCEPTED requests at
~queue_limit/capacity scan rounds; the unbounded run accepts everything
and the p99 grows to burst/capacity rounds.

Usage: python scripts/bench_serving.py [--requests 16] [--n-iter 50]
       [--editing | --burst]
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--n-iter", type=int, default=50)
    ap.add_argument("--editing", action="store_true",
                    help="bench concurrent img2img requests (strength "
                         "0.5) instead of text-to-image")
    ap.add_argument("--burst", action="store_true",
                    help="bench backpressure: 4x-capacity burst, "
                         "bounded vs unbounded queue")
    ap.add_argument("--consistency", action="store_true",
                    help="serve a consistency student "
                         "(LTDConfig.consistency): fresh-noise "
                         "multistep sampling — pair with a small "
                         "--n-iter (2-4)")
    ap.add_argument("--capacity", type=int, default=8,
                    help="--burst: device batch size (burst = 4x this)")
    args = ap.parse_args()

    from transformer_latent_diffusion_tpu.configs import (
        DenoiserConfig,
        LTDConfig,
    )
    from transformer_latent_diffusion_tpu.sampling import DiffusionTransformer
    from transformer_latent_diffusion_tpu.serve.batcher import MicroBatcher

    on_tpu = jax.default_backend() not in ("cpu",)
    cfg = LTDConfig(
        denoiser_cfg=DenoiserConfig(
            image_size=32, noise_embed_dims=256, patch_size=2, embed_dim=768,
            dropout=0, n_layers=12),
        use_pallas=on_tpu,
        consistency=args.consistency,
    )
    cfg.denoiser_load.dtype = "bfloat16" if on_tpu else "float32"
    print("building pipeline...", flush=True)
    tr = DiffusionTransformer(cfg)

    if args.burst:
        run_burst(tr, args)
        return

    n = args.requests
    prompts = [f"a cute cat number {i}" for i in range(n)]

    init_img = None
    if args.editing:
        import numpy as np

        rng = np.random.default_rng(0)
        init_img = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)

    def solo(i):
        if args.editing:
            return tr.image_to_image(
                init_img, prompts[i], strength=0.5, class_guidance=6,
                seed=i, num_imgs=1, n_iter=args.n_iter)
        return tr.generate_image_from_text(
            prompts[i], class_guidance=6, seed=i, num_imgs=1,
            n_iter=args.n_iter)

    print("warmup solo (compiles batch-1 scan)...", flush=True)
    t0 = time.time()
    solo(0)
    print(f"  {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    for i in range(n):
        solo(i)
    dt_solo = time.time() - t0
    print(f"sequential: {n} reqs in {dt_solo:.2f}s "
          f"({n / dt_solo:.2f} imgs/s, {dt_solo / n * 1e3:.0f} ms/req)",
          flush=True)

    # editing requests VAE-encode in the calling thread BEFORE they
    # enqueue, which spreads a simultaneous burst over ~1-2s; a 200 ms
    # window then splits the burst into several pad buckets and the
    # measured pass compiles fresh scan shapes. A 1 s window lets the
    # whole burst coalesce into one bucket (the scan it feeds runs
    # multiple seconds — the wait is amortized).
    mb = MicroBatcher(tr, max_batch=n,
                      max_wait_ms=1000.0 if args.editing else 200.0)

    def fire():
        lat = [None] * n
        errs = []

        def run(i):
            t = time.time()
            try:
                mb.generate(prompts[i], class_guidance=6, seed=i,
                            num_imgs=1, n_iter=args.n_iter, timeout=1800,
                            init_image=init_img,
                            strength=0.5 if args.editing else None)
                lat[i] = time.time() - t
            except BaseException as e:
                errs.append(e)

        ts = [threading.Thread(target=run, args=(i,)) for i in range(n)]
        t0 = time.time()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs, errs
        return time.time() - t0, lat

    print("warmup batched (compiles bucket scan)...", flush=True)
    t0 = time.time()
    fire()
    print(f"  {time.time() - t0:.1f}s", flush=True)
    if args.editing:
        # arrival races can still hit a not-yet-compiled pad bucket;
        # a second warmup pass makes the measured one honest
        t0 = time.time()
        fire()
        print(f"  warmup2 {time.time() - t0:.1f}s", flush=True)
    dt_b, lat = fire()
    print(f"microbatched: {n} reqs in {dt_b:.2f}s "
          f"({n / dt_b:.2f} imgs/s, p50 {sorted(lat)[n // 2] * 1e3:.0f} ms, "
          f"p100 {max(lat) * 1e3:.0f} ms)", flush=True)
    print(f"speedup: {dt_solo / dt_b:.2f}x", flush=True)
    mb.close()


def run_burst(tr, args):
    """Backpressure measurement (VERDICT r4 #4): fire 4x-capacity
    concurrent requests at a bounded and an unbounded batcher; report
    accepted/shed counts and the accepted-latency percentiles."""
    from transformer_latent_diffusion_tpu.serve.batcher import MicroBatcher
    from transformer_latent_diffusion_tpu.serve.errors import QueueFull

    cap = args.capacity
    burst_n = 4 * cap

    def one_burst(max_queue_imgs, label):
        # single pad bucket == capacity, so exactly one scan compiles
        mb = MicroBatcher(tr, max_batch=cap, max_wait_ms=100.0,
                          buckets=(cap,), max_queue_imgs=max_queue_imgs)
        try:
            # warm the FULL batched path: a concurrent mini-burst of
            # `cap` requests compiles both the batch-cap scan AND the
            # batch-cap text encode (a solo warmup leaves the encode
            # compile inside the measured burst — ~5 s of phantom
            # "queueing" on the tunneled runtime, measured)
            print(f"[{label}] warmup...", flush=True)
            wts = [threading.Thread(
                target=lambda i=i: mb.generate(f"warmup {i}",
                                               n_iter=args.n_iter,
                                               timeout=1800))
                   for i in range(cap)]
            for t in wts:
                t.start()
            for t in wts:
                t.join()
            lat, shed_lat = [], []

            def run(i):
                t = time.time()
                try:
                    mb.generate(f"a cute cat number {i}", seed=i,
                                n_iter=args.n_iter, timeout=1800)
                    lat.append(time.time() - t)
                except QueueFull:
                    shed_lat.append(time.time() - t)

            ts = [threading.Thread(target=run, args=(i,))
                  for i in range(burst_n)]
            t0 = time.time()
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            wall = time.time() - t0
        finally:
            mb.close()
        lat.sort()
        q = lambda v, p: v[min(len(v) - 1, int(p * len(v)))] if v else 0.0  # noqa: E731
        print(f"[{label}] burst {burst_n} reqs @ capacity {cap}: "
              f"accepted {len(lat)}, shed {len(shed_lat)} "
              f"(503 in {max(shed_lat) * 1e3 if shed_lat else 0:.0f} ms max); "
              f"accepted p50 {q(lat, 0.5):.2f}s p99 {q(lat, 0.99):.2f}s "
              f"max {q(lat, 1.0):.2f}s; wall {wall:.2f}s", flush=True)
        return q(lat, 0.99), len(shed_lat)

    p99_unbounded, _ = one_burst(0, "unbounded")
    p99_bounded, shed = one_burst(2 * cap, f"bounded {2 * cap}")
    print(f"p99 bounded/unbounded: {p99_bounded:.2f}/{p99_unbounded:.2f}s "
          f"({p99_bounded / max(p99_unbounded, 1e-9):.2f}x), "
          f"shed {shed}/{burst_n}", flush=True)


if __name__ == "__main__":
    main()
