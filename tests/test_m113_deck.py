"""M113 deck parameter fidelity vs the reference's own JSON deck.

Gator-style field-by-field validation (r4 verdict item 9) of
models.m113.M113_SPEC against /root/reference/data/vehicle/M113 (single-pin
track family, loaded at test time).
"""

import json
import os
import re

import pytest

from chrono_tpu.models.m113 import M113_SPEC

REF = "/root/reference/data/vehicle/M113"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference data not available")


def _load(rel):
    txt = open(os.path.join(REF, rel)).read()
    return json.loads(re.sub(r"//[^\n]*", "", txt))


def test_m113_deck_matches_reference_json():
    d = M113_SPEC
    ch = _load("chassis/M113_Chassis.json")["Components"][0]
    veh = _load("vehicle/M113_Vehicle_SinglePin.json")
    spr = _load("sprocket/M113_SprocketSinglePin_Left.json")
    shoe = _load("track_shoe/M113_TrackShoeSinglePin.json")
    ta = _load("track_assembly/M113_TrackAssemblySinglePin_Left.json")

    assert d["hull_mass"] == pytest.approx(ch["Mass"])
    assert tuple(d["chassis_inertia"]) == pytest.approx(
        tuple(ch["Moments of Inertia"]))
    assert tuple(d["chassis_com"]) == pytest.approx(
        tuple(ch["Centroidal Frame"]["Location"]))

    offs = [a["Offset"] for a in veh["Track Assemblies"]]
    assert d["half_track"] == pytest.approx(abs(offs[0]))
    assert offs[0] == pytest.approx(-offs[1])

    assert d["sprocket_radius"] == pytest.approx(
        spr["Profile"]["Assembly Radius"])
    assert d["sprocket_teeth"] == spr["Number Teeth"]
    assert d["sprocket_gear_mass"] == pytest.approx(spr["Gear Mass"])

    assert d["shoe_pitch"] == pytest.approx(shoe["Shoe"]["Pitch"])
    assert d["shoe_mass"] == pytest.approx(shoe["Shoe"]["Mass"])
    assert d["shoe_height"] == pytest.approx(shoe["Shoe"]["Height"])
    assert tuple(d["shoe_inertia"]) == pytest.approx(
        tuple(shoe["Shoe"]["Inertia"]))

    assert d["n_shoes"] == ta["Track Shoes"]["Number Shoes"]
    susp = ta["Suspension Subsystems"]
    assert d["n_road_wheels"] == len(susp)
    xs = [s["Location"][0] for s in susp]
    assert d["road_wheel_span"] == pytest.approx(max(xs) - min(xs))

    # lumped total = hull + both track loops' shoes
    assert d["total_mass"] == pytest.approx(
        ch["Mass"] + 2 * ta["Track Shoes"]["Number Shoes"]
        * shoe["Shoe"]["Mass"])
