"""FNV-1a 32-bit hashing in uint32 lanes — bit-parity mode.

The reference hashes the raw little-endian bytes of each quantized float4
PPF with FNV-1a (offset basis 2166136261, prime 16777619; kernel.cu:23-30,
kernel.h:22) and uses the result as the model hash key. The rebuild's primary
key is the injective packed integer (ops.ppf.pack_key); this module exists so
tests can prove the quantized features themselves are bit-identical by
reproducing the reference's hash values exactly, and to hash int32 triples
for translation-grid clustering parity (trans2idx_kernel, kernel.cu:663-699).
"""

from __future__ import annotations

import jax.numpy as jnp

FNV_OFFSET_BASIS = jnp.uint32(2166136261)
FNV_PRIME = jnp.uint32(16777619)


def _fnv1a_word(h, word):
    """Fold one little-endian uint32 word (4 bytes) into the hash."""
    for shift in (0, 8, 16, 24):
        byte = (word >> jnp.uint32(shift)) & jnp.uint32(0xFF)
        h = (h ^ byte) * FNV_PRIME
    return h


def fnv1a_words(words, h0=FNV_OFFSET_BASIS):
    """FNV-1a over the bytes of uint32 words along the last axis.

    words: (..., k) uint32. Returns (...) uint32."""
    words = jnp.asarray(words, jnp.uint32)
    h = jnp.broadcast_to(h0, words.shape[:-1])
    for i in range(words.shape[-1]):
        h = _fnv1a_word(h, words[..., i])
    return h


def fnv1a_float4(f):
    """Hash of a float4's raw bytes, matching hash(f, sizeof(float4))
    (kernel.cu:23-30, 460-477). f: (..., 4) float32 -> (...) uint32."""
    words = jnp.asarray(f, jnp.float32).view(jnp.uint32)
    return fnv1a_words(words)


def fnv1a_int3(v):
    """Hash of an int3's raw bytes, matching hash(&int3, sizeof(int3))
    (trans2idx_kernel, kernel.cu:680). v: (..., 3) int32 -> (...) uint32."""
    words = jnp.asarray(v, jnp.int32).view(jnp.uint32)
    return fnv1a_words(words)
