"""Compute ops: transform math, PPF features, hashing, voting, clustering."""
