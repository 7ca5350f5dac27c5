from transformer_latent_diffusion_tpu.train.checkpoint import (  # noqa: F401
    CheckpointManager,
    average_checkpoints,
    average_params,
    save_npz,
    unflatten_npz,
)
from transformer_latent_diffusion_tpu.train.train import (  # noqa: F401
    eval_gen,
    main,
    update_ema,
)
from transformer_latent_diffusion_tpu.train.distill import (  # noqa: F401
    consistency_apply,
    distill_consistency,
)
from transformer_latent_diffusion_tpu.train.lora import (  # noqa: F401
    init_lora_params,
    load_lora_file,
    lora_finetune,
    merge_lora,
    save_lora,
)
