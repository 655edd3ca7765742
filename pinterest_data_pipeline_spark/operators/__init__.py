"""Operator library: cleaning, argmax, dedup, similarity, text, multimodal."""
