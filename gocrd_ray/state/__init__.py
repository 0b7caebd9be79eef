"""Broadcast helpers: ray.put once, read inside every task/actor."""
