"""Polaris deck parameter fidelity vs the reference's own JSON deck.

Gator-style field-by-field validation (r4 verdict item 9) of
models.polaris.POLARIS_SPEC against /root/reference/data/vehicle/Polaris
(loaded at test time).  The Polaris reference encodes wheelbase in the
suspension hardpoints (both axle locations are x = 0) and uses nonlinear
spring/damper curves — the derivations are documented inline.
"""

import json
import os
import re

import pytest

from chrono_tpu.models.polaris import POLARIS_SPEC

REF = "/root/reference/data/vehicle/Polaris"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference data not available")


def _load(name):
    txt = open(os.path.join(REF, name)).read()
    return json.loads(re.sub(r"//[^\n]*", "", txt))


def test_polaris_deck_matches_reference_json():
    d = POLARIS_SPEC
    ch = _load("Polaris_Chassis.json")["Components"][0]
    veh = _load("Polaris.json")
    front = _load("Polaris_Front_DoubleWishbone.json")
    rear = _load("Polaris_Rear_TrailingArm.json")
    tire = _load("Polaris_TMeasyTire.json")
    wheel = _load("Polaris_Wheel.json")
    eng = _load("Polaris_EngineSimpleMap.json")
    trans = _load("Polaris_AutomaticTransmissionSimpleMap.json")

    assert d["chassis_mass"] == pytest.approx(ch["Mass"])
    assert tuple(d["chassis_inertia"]) == pytest.approx(
        tuple(ch["Moments of Inertia"]))
    assert tuple(d["chassis_com"]) == pytest.approx(
        tuple(ch["Centroidal Frame"]["Location"]))

    # both axles sit at Suspension Location x = 0; the wheelbase is the
    # rear trailing-arm spindle's x offset in its hardpoint set
    assert d["wheelbase"] == pytest.approx(-rear["Spindle"]["COM"][0])
    assert d["track"] == pytest.approx(2.0 * front["Spindle"]["COM"][1])

    assert d["wheel_mass"] == pytest.approx(
        wheel["Mass"] + tire["Design"]["Mass [kg]"])
    assert d["wheel_inertia_spin"] == pytest.approx(
        wheel["Inertia"][1] + tire["Design"]["Inertia [kg.m2]"][1])
    assert d["wheel_radius"] == pytest.approx(
        tire["Design"]["Unloaded Radius [m]"])
    assert d["wheel_width"] == pytest.approx(tire["Design"]["Width [m]"])

    # wheel-reflected rates: central-segment secants of the nonlinear
    # curves (spring: between the 2nd and 2nd-to-last sample — the end
    # segments are bump stops; damper: the |v| <= 0.13 m/s segment), times
    # the front double-wishbone motion ratio squared
    y_p = front["Lower Control Arm"]["Location Chassis Front"][1]
    y_s = front["Spring"]["Location Arm"][1]
    y_w = front["Spindle"]["COM"][1]
    mr = (y_s - y_p) / (y_w - y_p)
    crv = front["Spring"]["Spring Curve Data"]
    k_sec = (crv[-2][1] - crv[1][1]) / (crv[-2][0] - crv[1][0])
    assert d["suspension_k"] == pytest.approx(k_sec * mr**2, rel=1e-4)
    dc = {p[0]: p[1] for p in front["Shock"]["Damping Curve Data"]}
    c_sec = (dc[0.13] - dc[-0.13]) / 0.26
    assert d["suspension_c"] == pytest.approx(c_sec * mr**2, rel=1e-4)

    # EngineSimpleMap: deck stores the full-throttle peak torque and the
    # speed limit
    peak = max(p[1] for p in eng["Map Full Throttle"])
    assert d["engine_torque"] == pytest.approx(peak)
    assert d["engine_speed_rpm"] == pytest.approx(
        eng["Maximal Engine Speed RPM"])

    fwd = trans["Gear Box"]["Forward Gear Ratios"]
    assert tuple(d["gear_ratios"]) == pytest.approx(
        tuple(1.0 / r for r in fwd), rel=1e-3)

    # CG above ground = chassis COM z − (front axle z − tire radius)
    axle_z = veh["Axles"][0]["Suspension Location"][2]
    assert d["cg_height"] == pytest.approx(
        ch["Centroidal Frame"]["Location"][2] - axle_z
        + tire["Design"]["Unloaded Radius [m]"], abs=1e-3)
