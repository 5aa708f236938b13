from airv2x_tpu.config.loader import load_yaml, save_yaml

__all__ = ["load_yaml", "save_yaml"]
