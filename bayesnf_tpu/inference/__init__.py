"""Inference engines: ensemble MAP/MLE, ensemble VI, prediction, quantiles."""
