from transformer_latent_diffusion_tpu.serve.app import (  # noqa: F401
    GenerationService,
    create_app,
    create_fastapi_app,
    create_wsgi_app,
    serve,
)
