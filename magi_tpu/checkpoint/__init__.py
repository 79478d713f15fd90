from magi_tpu.checkpoint.loader import convert_dit_state, load_dit_params, load_state_dict
from magi_tpu.checkpoint.vae_loader import load_vae

__all__ = ["load_dit_params", "load_state_dict", "convert_dit_state", "load_vae"]
