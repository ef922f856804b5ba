"""NumPy implementation of the engine's declared semantics (constants.py) —
the unit-level golden oracle for similarity kernels and probmethods.

Mirrors reference SimilarityMethods.cs:55-113 / Probmethods.cs:73-176 with
the declared float64 + EPS deviations.
"""

from __future__ import annotations

import numpy as np

EPS = 1e-9


def cosine(a, b):
    a, b = np.asarray(a, float), np.asarray(b, float)
    denom = np.sqrt(a @ a) * np.sqrt(b @ b)
    raw = 0.0 if denom == 0 else (a @ b) / denom
    return (raw + 1.0) / 2.0


def euclidian(a, b):
    a, b = np.asarray(a, float), np.asarray(b, float)
    return 1.0 / (1.0 + np.sqrt(((a - b) ** 2).sum()))


def manhattan(a, b):
    a, b = np.asarray(a, float), np.asarray(b, float)
    return 1.0 / (1.0 + np.abs(a - b).sum())


def pearson(a, b):
    a, b = np.asarray(a, float), np.asarray(b, float)
    n = len(a)
    num = a @ b - a.sum() * b.sum() / n
    # Mirror the engine's denormal guard: variance product <= 0 (underflow
    # on denormal inputs) or NaN → 0, never a NaN correlation.
    varprod = (a @ a - a.sum() ** 2 / n) * (b @ b - b.sum() ** 2 / n)
    if not varprod > 0 or np.isnan(varprod):
        return 0.0
    return num / np.sqrt(varprod)


def mean(xs, **_):
    xs = np.asarray(xs, float)
    return 0.0 if len(xs) == 0 else xs.mean()


def harmonic_mean(xs, **_):
    xs = np.asarray(xs, float)
    nz = xs[np.abs(xs) > EPS]
    if len(nz) == 0:
        return 0.0
    inv = (1.0 / nz).sum()
    if inv == 0:
        return 0.0
    return len(nz) / inv * len(nz) / len(xs)


def quadratic_mean(xs, **_):
    xs = np.asarray(xs, float)
    return np.sqrt((xs * xs).mean())


def geometric_mean(xs, **_):
    xs = np.asarray(xs, float)
    if np.any(np.abs(xs) <= EPS):
        return 0.0
    sign = -1.0 if (xs < -EPS).sum() % 2 == 1 else 1.0
    return sign * np.exp(np.log(np.abs(xs)).mean())


def evew_avg(xs, **_):
    xs = np.asarray(xs, float)
    if np.any(np.abs(xs - 1.0) <= EPS):
        return 1.0
    if np.any(np.abs(xs) <= EPS):
        return 0.0
    f = (xs / (xs * (1 - xs))).sum()
    fm = (1.0 / (xs * (1 - xs))).sum()
    return 0.0 if fm == 0 else f / fm


def hvew_avg(xs, **_):
    xs = np.asarray(xs, float)
    if np.any(np.abs(xs - 1.0) <= EPS):
        return 1.0
    f = (xs / (1 - xs)).sum()
    fm = (1.0 / (1 - xs)).sum()
    return 0.0 if fm == 0 else f / fm


def lvew_avg(xs, **_):
    xs = np.asarray(xs, float)
    if np.any(np.abs(xs) <= EPS):
        return 0.0
    fm = (1.0 / xs).sum()
    return 0.0 if fm == 0 else len(xs) / fm


def dictionary_weighted_average(xs, keys=None, weights=None):
    xs = np.asarray(xs, float)
    w = np.array([float((weights or {}).get(k, 1.0)) for k in keys])
    sw = w.sum()
    return 0.0 if sw == 0 else (w * xs).sum() / sw


PROBMETHODS = {
    "Mean": mean,
    "HarmonicMean": harmonic_mean,
    "QuadraticMean": quadratic_mean,
    "GeometricMean": geometric_mean,
    "EVEWAvg": evew_avg,
    "HVEWAvg": hvew_avg,
    "LVEWAvg": lvew_avg,
    "DictionaryWeightedAverage": dictionary_weighted_average,
}

KERNELS = {
    "Cosine": cosine,
    "Euclidian": euclidian,
    "Manhattan": manhattan,
    "Pearson": pearson,
}
