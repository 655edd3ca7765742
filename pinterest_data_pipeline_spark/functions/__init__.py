"""Scalar function library: buckets, text metrics, hashing, vectors."""
