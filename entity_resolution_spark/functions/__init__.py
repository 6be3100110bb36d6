"""Scalar/array function library: similarity, hashing/sketches, text."""
