"""Filled in as operators land."""
