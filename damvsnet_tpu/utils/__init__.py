from .visualize import depth_to_color, save_depth_png
