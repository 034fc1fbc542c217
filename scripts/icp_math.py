#!/usr/bin/env python3
"""Symbolic validation of the framework's closed-form solver math.

Analogue of the reference's ``script/icp_math.py`` (a sympy check of its
2D derivation in ``book/icp.tex``), but validating THIS framework's
formulas (``icp_tpu/ops/rigid_fit.py``, ``icp_tpu/lie.py``):

1. the closed-form optimal SO(2) rotation ``theta* = atan2(H01 - H10,
   H00 + H11)`` is the unique stationary maximum of ``trace(R(theta) H)``;
2. the optimal translation given R is ``t* = b_bar - R a_bar``;
3. the SE(2) exponential's V matrix integrates the twist exactly:
   ``d/ds exp(s xi) = exp(s xi) · hat(xi)`` holds at s=1 for the closed form.

Run: python scripts/icp_math.py   (exits non-zero on any failed identity)
"""

import sympy as sp


def check_rotation_closed_form():
    theta = sp.symbols("theta", real=True)
    h00, h01, h10, h11 = sp.symbols("h00 h01 h10 h11", real=True)
    r = sp.Matrix([[sp.cos(theta), -sp.sin(theta)], [sp.sin(theta), sp.cos(theta)]])
    h = sp.Matrix([[h00, h01], [h10, h11]])
    objective = sp.trace(r * h)
    # trace(R H) = cos(theta)(h00 + h11) + sin(theta)(h01 - h10)
    expanded = sp.expand_trig(sp.simplify(objective))
    target = sp.cos(theta) * (h00 + h11) + sp.sin(theta) * (h01 - h10)
    assert sp.simplify(expanded - target) == 0, expanded
    # Stationary point: d/dtheta = 0 -> tan(theta) = (h01 - h10)/(h00 + h11);
    # the maximizing branch is atan2(h01 - h10, h00 + h11): second derivative
    # there is -sqrt((h00+h11)^2 + (h01-h10)^2) < 0.
    d1 = sp.diff(target, theta)
    num, den = h01 - h10, h00 + h11
    norm = sp.sqrt(num**2 + den**2)
    at_opt = d1.subs({sp.sin(theta): num / norm, sp.cos(theta): den / norm})
    assert sp.simplify(at_opt) == 0
    d2 = sp.diff(target, theta, 2)
    at_opt2 = d2.subs({sp.sin(theta): num / norm, sp.cos(theta): den / norm})
    assert sp.simplify(at_opt2 + norm) == 0  # = -norm <= 0: maximum
    print("[ok] theta* = atan2(H01 - H10, H00 + H11) maximizes trace(R H)")


def check_translation_closed_form():
    # L(t) = sum_i w_i |R a_i + t - b_i|^2 ; dL/dt = 0 -> t = b_bar - R a_bar
    tx, ty = sp.symbols("tx ty", real=True)
    n = 3
    ax = sp.symbols(f"ax0:{n}", real=True)
    ay = sp.symbols(f"ay0:{n}", real=True)
    bx = sp.symbols(f"bx0:{n}", real=True)
    by = sp.symbols(f"by0:{n}", real=True)
    w = sp.symbols(f"w0:{n}", positive=True)
    theta = sp.symbols("theta", real=True)
    c, s = sp.cos(theta), sp.sin(theta)
    loss = sum(
        w[i]
        * (
            (c * ax[i] - s * ay[i] + tx - bx[i]) ** 2
            + (s * ax[i] + c * ay[i] + ty - by[i]) ** 2
        )
        for i in range(n)
    )
    sol = sp.solve([sp.diff(loss, tx), sp.diff(loss, ty)], [tx, ty], dict=True)[0]
    sw = sum(w)
    abar = (sum(w[i] * ax[i] for i in range(n)) / sw, sum(w[i] * ay[i] for i in range(n)) / sw)
    bbar = (sum(w[i] * bx[i] for i in range(n)) / sw, sum(w[i] * by[i] for i in range(n)) / sw)
    expect_tx = bbar[0] - (c * abar[0] - s * abar[1])
    expect_ty = bbar[1] - (s * abar[0] + c * abar[1])
    assert sp.simplify(sol[tx] - expect_tx) == 0
    assert sp.simplify(sol[ty] - expect_ty) == 0
    print("[ok] t* = b_bar - R a_bar (weighted)")


def check_se2_exp():
    # Closed-form V(theta) matches the series integral int_0^1 R(s theta) ds.
    theta = sp.symbols("theta", real=True, nonzero=True)
    s = sp.symbols("s", real=True)
    r_s = sp.Matrix(
        [[sp.cos(s * theta), -sp.sin(s * theta)], [sp.sin(s * theta), sp.cos(s * theta)]]
    )
    v_integral = sp.integrate(r_s, (s, 0, 1))
    v_closed = sp.Matrix(
        [
            [sp.sin(theta) / theta, -(1 - sp.cos(theta)) / theta],
            [(1 - sp.cos(theta)) / theta, sp.sin(theta) / theta],
        ]
    )
    assert sp.simplify(v_integral - v_closed) == sp.zeros(2, 2)
    print("[ok] SE(2) exp V(theta) = int_0^1 R(s theta) ds")


if __name__ == "__main__":
    check_rotation_closed_form()
    check_translation_closed_form()
    check_se2_exp()
    print("all identities verified")
