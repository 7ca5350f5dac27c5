"""UI client for the generation API.

Capability parity with the reference gradio client
(/root/reference/tld/gradio_app.py): a text + guidance-slider interface
that POSTs to the HTTP API with a bearer token and displays the returned
JPEG. Framework-decoupled: talks to the service purely over HTTP via the
API_URL / API_TOKEN env vars.

gradio is optional; `generate_image_from_text` is usable directly (and by
any other frontend) without it.
"""

from __future__ import annotations

import os
from io import BytesIO


def generate_image_from_text(prompt: str, class_guidance: float = 6,
                             negative_prompt: str = ""):
    import requests
    from PIL import Image

    url = os.getenv("API_URL")
    token_id = os.getenv("API_TOKEN")
    headers = {"Authorization": f"Bearer {token_id}"}
    data = {"prompt": prompt, "class_guidance": class_guidance,
            "seed": 11, "num_imgs": 1, "img_size": 32}
    if negative_prompt.strip():
        data["negative_prompt"] = negative_prompt

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
                gr.Textbox(label="Negative prompt (optional)")],
        outputs="image",
        title="Text-to-Image Generator",
        description="Enter a text prompt to generate an image.",
    )


if __name__ == "__main__":
    build_interface().launch(server_name="0.0.0.0", server_port=7860)
