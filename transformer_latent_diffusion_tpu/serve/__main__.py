"""`python -m transformer_latent_diffusion_tpu.serve
       [--host H] [--port P] [--config ltd.json]`

--config (or the SERVE_CONFIG env var) points at a
`config_to_json(LTDConfig(...))` JSON file so operators can serve real
weights / image sizes / LoRA adapters / the int8 engine without
writing Python."""

import argparse

from transformer_latent_diffusion_tpu.serve.app import serve

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--config", default=None,
                    help="LTDConfig JSON (see configs.ltd_config_from_json)")
    args = ap.parse_args()
    cfg = None
    if args.config:
        from transformer_latent_diffusion_tpu.configs import (
            ltd_config_from_json,
        )

        cfg = ltd_config_from_json(args.config)
    serve(cfg=cfg, host=args.host, port=args.port)
