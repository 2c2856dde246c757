"""Scalar / text helper expressions shared across plans and pipelines."""
