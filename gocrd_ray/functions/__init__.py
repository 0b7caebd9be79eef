"""Scalar kits: coords/bbox/span/url/text-stat functions."""
