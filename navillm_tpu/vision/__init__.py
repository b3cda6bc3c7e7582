from .vit import ViTConfig, init_vit_params, vit_forward_features
