from .dtu_eval import evaluate_scan, evaluate_scans, reduce_points, nn_distances
