from .pipeline import ClipInference, montage_row, save_gif, to_display_rgb

__all__ = ["ClipInference", "montage_row", "save_gif", "to_display_rgb"]
