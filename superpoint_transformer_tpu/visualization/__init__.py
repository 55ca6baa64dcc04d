from .visualization import visualize_3d, Figure3D, class_palette
