"""Golden-vector tests for the numeric kernels.

Vectors ported verbatim from the reference implementation's inline tests,
which pinned them against libFLAC (reference: src/decode.rs:1754-1798,
src/encode.rs:3216-3272, 3404-3475, 3503-3527, 3591-3653, 3704-3745).
"""

import math

import numpy as np
import pytest

from flac_codec_tpu.decode import predict
from flac_codec_tpu.errors import LpNegativeShiftError, ZeroLpCoefficients
from flac_codec_tpu.models.lpc import (
    LpcParameters,
    autocorrelate,
    lp_coefficients,
    quantize,
    subframe_bits_by_order,
)
from flac_codec_tpu.models.lpc import lpc_residuals


def approx(a, b, tol=1.0e-6):
    assert abs(a - b) < tol, f"{a} != {b}"


# -- predict (reference: src/decode.rs:1754-1798) ---------------------------

def test_prediction_order7_shift9():
    coefficients = np.array([-75, 166, 121, -269, -75, -399, 1042][::-1],
                            dtype=np.int32)
    buffer = np.array([-796, -547, -285, -32, 199, 443, 670, -2, -23, 14, 6,
                       3, -4, 12, -2, 10], dtype=np.int64)
    predict(coefficients, 9, buffer)
    np.testing.assert_array_equal(buffer, [
        -796, -547, -285, -32, 199, 443, 670, 875, 1046, 1208, 1343, 1454,
        1541, 1616, 1663, 1701])


def test_prediction_order7_shift10():
    coefficients = np.array([119, -255, 555, -836, 879, -1199, 1757][::-1],
                            dtype=np.int32)
    buffer = np.array([-21363, -21951, -22649, -24364, -27297, -26870,
                       -30017, 3157], dtype=np.int64)
    predict(coefficients, 10, buffer)
    np.testing.assert_array_equal(buffer, [
        -21363, -21951, -22649, -24364, -27297, -26870, -30017, -29718])


def test_prediction_order20_shift12():
    coefficients = np.array([
        709, -2589, 4600, -4612, 1350, 4220, -9743, 12671, -12129, 8586,
        -3775, -645, 3904, -5543, 4373, 182, -6873, 13265, -15417, 11550,
    ][::-1], dtype=np.int32)
    buffer = np.array([
        213238, 210830, 234493, 209515, 235139, 201836, 208151, 186277,
        157720, 148176, 115037, 104836, 60794, 54523, 412, 17943, -6025,
        -3713, 8373, 11764, 30094], dtype=np.int64)
    predict(coefficients, 12, buffer)
    np.testing.assert_array_equal(buffer, [
        213238, 210830, 234493, 209515, 235139, 201836, 208151, 186277,
        157720, 148176, 115037, 104836, 60794, 54523, 412, 17943, -6025,
        -3713, 8373, 11764, 33931])


# -- residual encode (reference: src/encode.rs:3216-3272) -------------------

def test_residual_encoding_1():
    samples = np.array([
        0, 16, 31, 44, 54, 61, 64, 63, 58, 49, 38, 24, 8, -8, -24, -38, -49,
        -58, -63, -64, -61, -54, -44, -31, -16], dtype=np.int64)
    params = LpcParameters(order=2, precision=7, shift=5,
                           coefficients=np.array([59, -30], dtype=np.int32))
    res = lpc_residuals(samples, params)
    np.testing.assert_array_equal(res, [
        2, 2, 2, 3, 3, 3, 2, 2, 3, 0, 0, 0, -1, -1, -1, -3, -2, -2, -2, -1,
        -1, 0, 0])


def test_residual_encoding_2():
    samples = np.array([
        64, 62, 56, 47, 34, 20, 4, -12, -27, -41, -52, -60, -63, -63, -60,
        -52, -41, -27, -12, 4, 20, 34, 47, 56, 62], dtype=np.int64)
    params = LpcParameters(order=2, precision=7, shift=5,
                           coefficients=np.array([58, -29], dtype=np.int32))
    res = lpc_residuals(samples, params)
    np.testing.assert_array_equal(res, [
        2, 2, 0, 1, -1, -1, -1, -2, -2, -2, -1, -3, -2, 0, -1, 1, 0, 2, 2, 2,
        4, 2, 4])


# -- quantize (reference: src/encode.rs:3404-3475) --------------------------

def test_quantization():
    shift, coeffs = quantize(
        np.array([0.797774, -0.045362, -0.050136, -0.054254]), 10)
    assert shift == 9
    np.testing.assert_array_equal(coeffs, [408, -23, -25, -28])

    shift, coeffs = quantize(
        np.array([-0.054687, -0.953216, -0.027115, 0.033537]), 10)
    assert shift == 9
    np.testing.assert_array_equal(coeffs, [-28, -488, -14, 17])

    with pytest.raises(ZeroLpCoefficients):
        quantize(np.array([0.0, 0.0, 0.0, 0.0]), 10)

    shift, coeffs = quantize(np.array([-0.1, 0.1, 10000000.0, -0.2]), 10)
    assert shift == 0
    np.testing.assert_array_equal(coeffs, [0, 0, 305, 0])

    with pytest.raises(LpNegativeShiftError):
        quantize(np.array([-0.1, 0.1, 100000000.0, -0.2]), 10)


# -- autocorrelate (reference: src/encode.rs:3503-3527) ---------------------

def test_autocorrelation():
    np.testing.assert_allclose(autocorrelate(np.array([1.0]), 1), [1.0])
    np.testing.assert_allclose(
        autocorrelate(np.array([1.0, 2.0, 3.0, 4.0, 5.0]), 4),
        [55.0, 40.0, 26.0, 14.0, 5.0])
    np.testing.assert_allclose(
        autocorrelate(np.array([
            0.0, 16.0, 31.0, 44.0, 54.0, 61.0, 64.0, 63.0, 58.0, 49.0, 38.0,
            24.0, 8.0, -8.0, -24.0, -38.0, -49.0, -58.0, -63.0, -64.0, -61.0,
            -54.0, -44.0, -31.0, -16.0]), 4),
        [51408.0, 49792.0, 45304.0, 38466.0, 29914.0])


# -- Levinson-Durbin (reference: src/encode.rs:3591-3653) -------------------

def test_lp_coefficients_1():
    lp = lp_coefficients(np.array([55.0, 40.0, 26.0, 14.0, 5.0]))
    assert len(lp) == 4
    errors = [e for _, e in lp]
    for got, want in zip(errors, [25.909091, 25.540351, 25.316142, 25.241623]):
        approx(got, want)
    approx(lp[0][0][0], 0.727273)
    np.testing.assert_allclose(lp[1][0], [0.814035, -0.119298], atol=1e-6)
    np.testing.assert_allclose(lp[2][0], [0.802858, -0.043028, -0.093694],
                               atol=1e-6)
    np.testing.assert_allclose(lp[3][0], [0.797774, -0.045362, -0.050136,
                                          -0.054254], atol=1e-6)


def test_lp_coefficients_2():
    lp = lp_coefficients(np.array([51408.0, 49792.0, 45304.0, 38466.0,
                                   29914.0]))
    assert len(lp) == 4
    errors = [e for _, e in lp]
    for got, want in zip(errors, [3181.201369, 495.815931, 495.161449,
                                  494.604514]):
        approx(got, want)
    approx(lp[0][0][0], 0.968565)
    np.testing.assert_allclose(lp[1][0], [1.858456, -0.918772], atol=1e-6)
    np.testing.assert_allclose(lp[2][0], [1.891837, -0.986293, 0.036332],
                               atol=1e-6)
    np.testing.assert_allclose(lp[3][0], [1.890618, -0.953216, -0.027115,
                                          0.033537], atol=1e-6)


# -- expected bits / best order (reference: src/encode.rs:3704-3745) --------

def test_compute_best_order():
    coeffs = [(np.array([]), e)
              for e in [3181.201369, 495.815931, 495.161449, 494.604514]]
    bits = [b for b, _, _ in subframe_bits_by_order(16, 5, 20, coeffs)]
    for got, want in zip(bits, [80.977565, 74.685594, 93.853530, 113.025628]):
        approx(got, want)

    coeffs = [(np.array([]), e)
              for e in [15000.0, 25000.0, 20000.0, 30000.0]]
    bits = [b for b, _, _ in subframe_bits_by_order(16, 10, 4096, coeffs)]
    for got, want in zip(bits, [1812.801817, 3346.934051, 2713.303385,
                                3935.492805]):
        approx(got, want)
