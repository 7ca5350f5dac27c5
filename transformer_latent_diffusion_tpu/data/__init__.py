from transformer_latent_diffusion_tpu.data.pipeline import (  # noqa: F401
    append_to_dataset,
    decode_latents,
    dequantize_latents,
    download_and_process_data,
    encode_image,
    encode_text,
    get_text_and_latent_embeddings_hdf5,
    hdf5_to_npy,
    iter_webdataset_shards,
    main,
    quantize_latents,
)
