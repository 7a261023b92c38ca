"""Remaining reference vehicle families as parameter decks
(chrono_tpu.models.decks ↔ src/chrono_models/vehicle/{gator,feda,uaz,jeep,
bmw,citybus,man,kraz,artcar,duro,gclass,mrole,mtv,unimog,marder}): every
deck settles, accelerates straight and turns; the tracked Marder spins up
under sprocket torque."""

import numpy as np
import jax.numpy as jnp
import pytest

from chrono_tpu.models.decks import DECKS, create_vehicle, build_marder
from tests.test_models_vehicles import _check_family

# 3 s full-throttle speed windows per family (heavier → slower)
SPEED = {
    # Gator: 14 kW engine + 0.6-mu turf tires (reference JSON values) —
    # a ~25 mph utility vehicle, not a car
    "gator": (2.0, 12.0),
    "feda": (4.0, 30.0),
    "uaz": (5.0, 35.0),
    "jeep": (5.0, 38.0),
    "bmw": (6.0, 42.0),
    "citybus": (2.0, 22.0),
    "man": (2.5, 25.0),
    "kraz": (2.0, 24.0),
    "duro": (3.0, 28.0),
    "gclass": (5.0, 36.0),
    "mrole": (1.5, 22.0),
    "mtv": (2.5, 26.0),
    "unimog": (1.5, 18.0),
}


@pytest.mark.parametrize("name", sorted(DECKS))
def test_deck_drives(name):
    lo, hi = SPEED[name]
    _check_family(lambda: create_vehicle(name), lo, hi)


def test_marder_accelerates():
    import jax
    from chrono_tpu.vehicle.tracked import tracked_step

    veh, state = build_marder()
    flat = lambda xy: jnp.zeros(xy.shape[:-1])
    h = 2e-3
    step = jax.jit(lambda s, tq: tracked_step(veh, s, tq, flat, h))
    tq = jnp.asarray([16000.0, 16000.0], jnp.float32)
    for _ in range(600):
        state = step(state, tq).state
    vx = float(state.v[veh.chassis, 0])
    assert 0.5 < vx < 15.0
    assert np.isfinite(np.asarray(state.x)).all()
