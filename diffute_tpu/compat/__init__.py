from diffute_tpu.compat.hf_import import (  # noqa: F401
    import_unet_state_dict,
    import_vae_state_dict,
    import_trocr_state_dict,
    export_unet_params,
    export_vae_params,
    export_trocr_params,
    load_safetensors,
    save_safetensors,
)
