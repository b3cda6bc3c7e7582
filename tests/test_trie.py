import jax.numpy as jnp
import numpy as np

from navillm_tpu.models.trie import DenseTrie

EOS = 99


def test_allowed_and_advance():
    trie = DenseTrie([[5, 6], [5, 7, 8], [9]], eos_id=EOS)
    state = jnp.zeros((2,), jnp.int32)
    mask = np.asarray(trie.logits_mask(state, 100))
    assert mask[0, 5] and mask[0, 9]
    assert not mask[0, 6] and not mask[0, EOS]

    # advance both rows by 5 -> children {6, 7}
    state = trie.advance(state, jnp.array([5, 5]))
    mask = np.asarray(trie.logits_mask(state, 100))
    assert mask[0, 6] and mask[0, 7] and not mask[0, 9]

    # row0: 6 -> leaf -> only eos; row1: 7 -> child {8}
    state = trie.advance(state, jnp.array([6, 7]))
    mask = np.asarray(trie.logits_mask(state, 100))
    assert mask[0].sum() == 1 and mask[0, EOS]
    assert mask[1].sum() == 1 and mask[1, 8]

    # row1: 8 -> leaf -> only eos
    state = trie.advance(state, jnp.array([EOS, 8]))
    mask = np.asarray(trie.logits_mask(state, 100))
    assert mask[1].sum() == 1 and mask[1, EOS]

    # leaf state is absorbing (reference tools/trie.py:31-33)
    state2 = trie.advance(state, jnp.array([EOS, EOS]))
    np.testing.assert_array_equal(np.asarray(state2), np.asarray(state))


def test_single_token_sequences():
    trie = DenseTrie([[3], [4]], eos_id=EOS)
    state = jnp.zeros((1,), jnp.int32)
    mask = np.asarray(trie.logits_mask(state, 10))
    assert mask[0, 3] and mask[0, 4] and mask[0].sum() == 2
