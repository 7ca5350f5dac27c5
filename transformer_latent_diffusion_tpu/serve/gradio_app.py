"""UI client for the generation API.

Capability parity with the reference gradio client
(/root/reference/tld/gradio_app.py): a text + guidance-slider interface
that POSTs to the HTTP API with a bearer token and displays the returned
JPEG. Framework-decoupled: talks to the service purely over HTTP via the
API_URL / API_TOKEN env vars.

Beyond-reference controls (mirror the service's extra request fields):
negative prompt, seed, sampling steps, and the editing triad — an
optional init image (img2img via `strength`) and an optional mask image
(inpainting; white = regenerate). Uploads are base64-PNG-encoded into the
same `init_image`/`mask` request fields the HTTP service accepts.

gradio is optional; `generate_image_from_text` is usable directly (and by
any other frontend) without it.
"""

from __future__ import annotations

import base64
import os
from io import BytesIO


def _b64_png(image) -> str:
    """PIL image or HxWx3 array -> base64 PNG string for the API."""
    import PIL.Image

    if not isinstance(image, PIL.Image.Image):
        import numpy as np

        image = PIL.Image.fromarray(np.asarray(image))
    buf = BytesIO()
    image.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def generate_image_from_text(prompt: str, class_guidance: float = 6,
                             negative_prompt: str = "",
                             init_image=None, mask=None,
                             strength: float = 0.5,
                             seed: int = 11, n_iter: int = 15,
                             interpolate_to: str = "",
                             seed_b: float = -1,
                             n_frames: int = 4,
                             best_of: float = 1,
                             sampler: str = "default",
                             cfg_rescale: float = 0.0,
                             eta: float = 0.0):
    import requests
    from PIL import Image

    url = os.getenv("API_URL")
    token_id = os.getenv("API_TOKEN")
    headers = {"Authorization": f"Bearer {token_id}"}
    data = {"prompt": prompt, "class_guidance": class_guidance,
            "seed": int(seed), "num_imgs": 1, "img_size": 32,
            "n_iter": int(n_iter)}
    if negative_prompt.strip():
        data["negative_prompt"] = negative_prompt
    morph = (interpolate_to.strip() or int(seed_b) >= 0)
    if morph and init_image is None:
        # interpolation strip (excludes init_image server-side):
        # prompt-morph via interpolate_to and/or noise-space morph via
        # seed_b (seed -> seed_b DDIM slerp; -1 = off)
        if interpolate_to.strip():
            data["interpolate_to"] = interpolate_to
        if int(seed_b) >= 0:
            data["seed_b"] = int(seed_b)
        data["num_imgs"] = int(n_frames)
    if init_image is not None:
        data["init_image"] = _b64_png(init_image)
        data["strength"] = float(strength)
        if mask is not None:
            data["mask"] = _b64_png(mask)
    elif not morph and int(best_of) > 1:
        # best-of-N CLIP re-ranking (plain text-to-image only)
        data["best_of"] = int(best_of)
    if (init_image is None and not morph and int(best_of) <= 1):
        # solver knobs (plain text-to-image only, like the server)
        if sampler and sampler != "default":
            data["sampler"] = sampler
        if cfg_rescale:
            data["cfg_rescale"] = float(cfg_rescale)
        if eta and sampler == "ddim":
            # stochastic DDIM (server rejects eta on other samplers)
            data["eta"] = float(eta)

    response = requests.post(url, json=data, headers=headers)
    if response.status_code == 200:
        return Image.open(BytesIO(response.content))
    print("Failed to fetch image:", response.status_code, response.text)
    return None


def build_interface():
    import gradio as gr

    return gr.Interface(
        fn=generate_image_from_text,
        inputs=["text", "slider",
                gr.Textbox(label="Negative prompt (optional)"),
                gr.Image(label="Init image (optional, img2img)",
                         type="pil"),
                gr.Image(label="Mask (optional, white = regenerate)",
                         type="pil", image_mode="L"),
                gr.Slider(0.0, 1.0, value=0.5, label="Strength"),
                gr.Number(value=11, precision=0, label="Seed"),
                gr.Slider(1, 50, value=15, step=1, label="Steps"),
                gr.Textbox(label="Interpolate to (optional: prompt-morph "
                                 "strip)"),
                gr.Number(value=-1, precision=0,
                          label="Seed B (optional: noise-morph strip from "
                                "Seed to Seed B; -1 = off)"),
                gr.Slider(2, 10, value=4, step=1, label="Frames"),
                gr.Slider(1, 16, value=1, step=1,
                          label="Best of N (CLIP re-ranked candidates; "
                                "1 = off)"),
                gr.Dropdown(["default", "ddim", "dpm", "heun"],
                            value="default", label="Sampler"),
                gr.Slider(0.0, 1.0, value=0.0, step=0.25,
                          label="CFG rescale (0 = off)"),
                gr.Slider(0.0, 1.0, value=0.0, step=0.25,
                          label="Eta (stochastic DDIM; needs "
                                "Sampler=ddim; 0 = off)")],
        outputs="image",
        title="Text-to-Image Generator",
        description="Enter a text prompt to generate an image. Optionally "
                    "upload an init image (img2img) and a mask (inpaint).",
    )


if __name__ == "__main__":
    build_interface().launch(server_name="0.0.0.0", server_port=7860)
