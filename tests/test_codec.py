"""Golden tests for partition label maps.

The expected values re-derive the reference semantics from first principles
(the name-based group maps in pesquisa_v5/v6 data hubs) and check the
vectorized lookup tables against them for every partition id.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from av1tpu.codec import partitions as P

ALL_IDS = np.arange(10)


def test_stage1_binary():
    got = P.map_to_stage1(ALL_IDS)
    expected = np.array([0, 1, 1, 1, 1, 1, 1, 1, 1, 1])
    np.testing.assert_array_equal(got, expected)


def test_stage2_v5_five_way():
    # NONE=0, SPLIT=1, RECT=2, AB=3, 1TO4=4 per STAGE2_GROUPS insertion order
    got = P.map_to_stage2_v5(ALL_IDS)
    expected = np.array([0, 2, 2, 1, 3, 3, 3, 3, 4, 4])
    np.testing.assert_array_equal(got, expected)


def test_stage2_v6_three_way_with_mask():
    got, valid = P.map_to_stage2_v6(ALL_IDS)
    expected = np.array([-1, 1, 1, 0, 2, 2, 2, 2, -1, -1])
    np.testing.assert_array_equal(got, expected)
    np.testing.assert_array_equal(valid, expected != -1)


def test_stage3_heads_v6():
    heads = P.map_to_stage3_v6(ALL_IDS)
    np.testing.assert_array_equal(
        heads["RECT"], [-1, 0, 1, -1, -1, -1, -1, -1, -1, -1]
    )
    np.testing.assert_array_equal(
        heads["AB"], [-1, -1, -1, -1, 0, 1, 2, 3, -1, -1]
    )


def test_stage3_heads_v5_has_1to4():
    heads = P.map_to_stage3_v5(ALL_IDS)
    np.testing.assert_array_equal(
        heads["1TO4"], [-1, -1, -1, -1, -1, -1, -1, -1, 0, 1]
    )


def test_flatten_roundtrip():
    flat = P.map_to_flatten(ALL_IDS)
    np.testing.assert_array_equal(flat, [-1, 0, 1, 2, 3, 4, 5, 6, -1, -1])
    realized = flat[flat >= 0]
    np.testing.assert_array_equal(
        P.flatten_to_raw(realized), [1, 2, 3, 4, 5, 6, 7]
    )


def test_jax_arrays_supported():
    got = P.map_to_stage2_v5(jnp.asarray(ALL_IDS))
    assert isinstance(got, jnp.ndarray)
    np.testing.assert_array_equal(np.asarray(got), [0, 2, 2, 1, 3, 3, 3, 3, 4, 4])


def test_ab_swap_tables_v6_match_reference_augmentation():
    # hflip: HORZ_A<->HORZ_B, VERT unchanged (augmentation.py:13-26)
    np.testing.assert_array_equal(P.AB_HFLIP_SWAP_V6, [1, 0, 2, 3])
    # vflip: VERT_A<->VERT_B (augmentation.py:29-42)
    np.testing.assert_array_equal(P.AB_VFLIP_SWAP_V6, [0, 1, 3, 2])
    # rot90 cw: HA->VA, HB->VB, VA->HB, VB->HA (augmentation.py:56-64)
    np.testing.assert_array_equal(P.AB_ROT90_SWAP_V6, [2, 3, 1, 0])
    # rot270: HA->VB, HB->VA, VA->HA, VB->HB (augmentation.py:65-73)
    np.testing.assert_array_equal(P.AB_ROT270_SWAP_V6, [3, 2, 0, 1])


def test_ab_swap_tables_v6_are_involutions_or_cycles():
    # flips are involutions
    for table in (P.AB_HFLIP_SWAP_V6, P.AB_VFLIP_SWAP_V6):
        np.testing.assert_array_equal(table[table], np.arange(4))
    # rot90 then rot270 is identity
    np.testing.assert_array_equal(
        P.AB_ROT270_SWAP_V6[P.AB_ROT90_SWAP_V6], np.arange(4)
    )


def test_v5_swap_tables_match_reference_training_script():
    # 012_train_stage3.py:215-219: hflip {0:1,1:0,2:3,3:2}; rot90 {0:2,2:0,1:3,3:1}
    np.testing.assert_array_equal(P.AB_HFLIP_SWAP_V5, [1, 0, 3, 2])
    np.testing.assert_array_equal(P.AB_ROT90_SWAP_V5, [2, 3, 0, 1])


def test_class_distribution():
    labels = np.array([0, 0, 3, 1])
    dist = P.class_distribution(labels)
    assert dist["PARTITION_NONE"] == 0.5
    assert dist["PARTITION_SPLIT"] == 0.25
    assert "PARTITION_VERT" not in dist


def test_bsize_index_map():
    assert P.BSIZE_INDEX_TO_PIXELS == {3: 8, 6: 16, 9: 32, 12: 64}
