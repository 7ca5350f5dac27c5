"""`python -m transformer_latent_diffusion_tpu.serve [--host H] [--port P]`"""

import argparse

from transformer_latent_diffusion_tpu.serve.app import serve

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    args = ap.parse_args()
    serve(host=args.host, port=args.port)
