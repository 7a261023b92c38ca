"""FMI 2.0 + 3.0 import/export for external dynamics blocks.

Role of the reference's chrono_fmi module
(/root/reference/src/chrono_fmi/ChExternalFmu.h:43-90: wrap a
model-exchange FMU as an external dynamics block with named
inputs/outputs/states; fmi2/ChFmuToolsExport.h: export Chrono models as
FMUs), scoped to what is meaningful in a TPU-native framework:

* :class:`Fmu` — a ctypes importer for FMI 2.0 FMUs (model exchange and
  co-simulation): unzip, parse ``modelDescription.xml``, load the
  ``binaries/linux64`` shared object, drive the fmi2 C API.
* :func:`make_fmu_ode` — expose a model-exchange FMU as an ``f(t, x, u)``
  derivative function usable by the external-ODE coupling
  (chrono_tpu.physics.external).  The FMU's C code is inherently
  host-side, so it enters the jitted step through ``jax.pure_callback``
  — exactly where the reference pays a CPU call as well.
* :func:`export_fmu_lti` — generate + compile (g++) a standard-layout
  FMI 2.0 FMU for an LTI block ẋ = Ax + Bu, y = Cx + Du, supporting both
  model-exchange and co-simulation (internal RK4) interfaces.  This is
  the exporter for the ChExternalDynamicsODE class of blocks; exporting
  a full vehicle (the reference's chrono_vehicle/fmi FMUs) would require
  embedding the engine in C and stays out of scope.
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import tempfile
import zipfile
import xml.etree.ElementTree as ET

import numpy as np

__all__ = ["Fmu", "make_fmu_ode", "export_fmu_lti",
           "export_fmu_lti3"]


# --------------------------------------------------------------------------
# fmi2 ctypes plumbing
# --------------------------------------------------------------------------

_fmi2CallbackLogger = ctypes.CFUNCTYPE(
    None, ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
    ctypes.c_char_p)
_fmi2AllocateMemory = ctypes.CFUNCTYPE(
    ctypes.c_void_p, ctypes.c_size_t, ctypes.c_size_t)
_fmi2FreeMemory = ctypes.CFUNCTYPE(None, ctypes.c_void_p)


class _Callbacks(ctypes.Structure):
    _fields_ = [("logger", _fmi2CallbackLogger),
                ("allocateMemory", _fmi2AllocateMemory),
                ("freeMemory", _fmi2FreeMemory),
                ("stepFinished", ctypes.c_void_p),
                ("componentEnvironment", ctypes.c_void_p)]


def _logger(env, name, status, cat, msg):
    pass


_libc = ctypes.CDLL(None)
_libc.calloc.restype = ctypes.c_void_p
_libc.calloc.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
_libc.free.argtypes = [ctypes.c_void_p]

_CB = _Callbacks(
    logger=_fmi2CallbackLogger(_logger),
    allocateMemory=_fmi2AllocateMemory(
        lambda n, sz: _libc.calloc(n, sz)),
    freeMemory=_fmi2FreeMemory(lambda p: _libc.free(p)),
    stepFinished=None, componentEnvironment=None)


class FmuVariable:
    def __init__(self, name, vr, causality, start):
        self.name = name
        self.vr = vr
        self.causality = causality
        self.start = start

    def __repr__(self):
        return f"FmuVariable({self.name!r}, vr={self.vr}, {self.causality})"


class Fmu:
    """An instantiated FMI 2.0 FMU (ChExternalFmu / FmuUnit role).

    ``mode``: "model_exchange" or "co_simulation" (must be offered by the
    FMU's modelDescription).
    """

    def __init__(self, path, mode="model_exchange", instance="chrono_tpu"):
        self._dir = tempfile.mkdtemp(prefix="fmu_")
        with zipfile.ZipFile(path) as z:
            z.extractall(self._dir)
        tree = ET.parse(os.path.join(self._dir, "modelDescription.xml"))
        root = tree.getroot()
        self.fmi_version = root.get("fmiVersion", "2.0")
        self.v3 = self.fmi_version.startswith("3")
        self.guid = (root.get("instantiationToken") if self.v3
                     else root.get("guid"))
        self.model_name = root.get("modelName")
        tag = ("ModelExchange" if mode == "model_exchange"
               else "CoSimulation")
        node = root.find(tag)
        if node is None:
            raise ValueError(f"FMU does not offer {tag}")
        ident = node.get("modelIdentifier")
        self.mode = mode

        self.variables = {}
        self.states = []          # state variable names, in derivative order
        svars = []
        if self.v3:
            # FMI 3.0 schema: flat typed variables; a derivative variable
            # carries derivative="<state vr>" directly
            by_vr = {}
            for sv in root.find("ModelVariables").iter("Float64"):
                v = FmuVariable(sv.get("name"),
                                int(sv.get("valueReference")),
                                sv.get("causality", "local"),
                                float(sv.get("start", "0") or 0.0))
                self.variables[v.name] = v
                svars.append((sv, v))
                by_vr[v.vr] = v
            ms = root.find("ModelStructure")
            if ms is not None:
                for unk in ms.iter("ContinuousStateDerivative"):
                    der = by_vr[int(unk.get("valueReference"))]
                    der_sv = next(sv for sv, v in svars if v is der)
                    self.states.append(
                        by_vr[int(der_sv.get("derivative"))].name)
        else:
            for sv in root.find("ModelVariables").iter("ScalarVariable"):
                real = sv.find("Real")
                if real is None:
                    continue
                v = FmuVariable(sv.get("name"),
                                int(sv.get("valueReference")),
                                sv.get("causality", "local"),
                                float(real.get("start", "0") or 0.0))
                self.variables[v.name] = v
                svars.append((sv, v))
            # continuous states: variables referenced by derivative entries
            ders = root.find("ModelStructure")
            if ders is not None and ders.find("Derivatives") is not None:
                for unk in ders.find("Derivatives").iter("Unknown"):
                    idx = int(unk.get("index")) - 1
                    der_sv, _ = svars[idx]
                    ref = int(der_sv.find("Real").get("derivative")) - 1
                    self.states.append(svars[ref][1].name)
        self.inputs = [v.name for _, v in svars if v.causality == "input"]
        self.outputs = [v.name for _, v in svars if v.causality == "output"]

        subdir = "x86_64-linux" if self.v3 else "linux64"
        so = os.path.join(self._dir, "binaries", subdir, ident + ".so")
        self._lib = ctypes.CDLL(so)
        L = self._lib
        # declare EVERY signature: undeclared argtypes make ctypes truncate
        # the 64-bit component pointer to int
        P, D, U, I, S = (ctypes.c_void_p, ctypes.c_double, ctypes.c_uint,
                         ctypes.c_int, ctypes.c_size_t)
        Dp, Up = ctypes.POINTER(D), ctypes.POINTER(U)
        Ip = ctypes.POINTER(I)
        if self.v3:
            L.fmi3InstantiateModelExchange.restype = P
            L.fmi3InstantiateModelExchange.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, I, I,
                P, P]
            L.fmi3InstantiateCoSimulation.restype = P
            L.fmi3InstantiateCoSimulation.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, I, I,
                I, I, Up, S, P, P]
            for name, argt in [
                    ("fmi3EnterInitializationMode", [P, I, D, D, I, D]),
                    ("fmi3ExitInitializationMode", [P]),
                    ("fmi3Terminate", [P]),
                    ("fmi3FreeInstance", [P]),
                    ("fmi3GetFloat64", [P, Up, S, Dp, S]),
                    ("fmi3SetFloat64", [P, Up, S, Dp, S]),
                    ("fmi3SetTime", [P, D]),
                    ("fmi3SetContinuousStates", [P, Dp, S]),
                    ("fmi3GetContinuousStates", [P, Dp, S]),
                    ("fmi3GetContinuousStateDerivatives", [P, Dp, S]),
                    ("fmi3DoStep", [P, D, D, I, Ip, Ip, Ip, Dp]),
            ]:
                fn = getattr(L, name, None)
                if fn is not None:
                    fn.argtypes = argt
                    if name != "fmi3FreeInstance":
                        fn.restype = I
            if mode == "model_exchange":
                self._c = L.fmi3InstantiateModelExchange(
                    instance.encode(), self.guid.encode(),
                    ("file://" + self._dir).encode(), 0, 0, None, None)
            else:
                self._c = L.fmi3InstantiateCoSimulation(
                    instance.encode(), self.guid.encode(),
                    ("file://" + self._dir).encode(), 0, 0, 0, 0,
                    None, 0, None, None)
            if not self._c:
                raise RuntimeError("fmi3Instantiate failed")
            self._nx = len(self.states)
            return
        L.fmi2Instantiate.restype = P
        L.fmi2Instantiate.argtypes = [
            ctypes.c_char_p, I, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(_Callbacks), I, I]
        for name, argt in [
                ("fmi2SetupExperiment", [P, I, D, D, I, D]),
                ("fmi2EnterInitializationMode", [P]),
                ("fmi2ExitInitializationMode", [P]),
                ("fmi2Terminate", [P]),
                ("fmi2FreeInstance", [P]),
                ("fmi2GetReal", [P, Up, S, Dp]),
                ("fmi2SetReal", [P, Up, S, Dp]),
                ("fmi2SetTime", [P, D]),
                ("fmi2SetContinuousStates", [P, Dp, S]),
                ("fmi2GetContinuousStates", [P, Dp, S]),
                ("fmi2GetDerivatives", [P, Dp, S]),
                ("fmi2DoStep", [P, D, D, I]),
        ]:
            fn = getattr(L, name, None)
            if fn is not None:
                fn.argtypes = argt
                if name != "fmi2FreeInstance":
                    fn.restype = I
        fmu_type = 0 if mode == "model_exchange" else 1
        self._c = L.fmi2Instantiate(
            instance.encode(), fmu_type, self.guid.encode(),
            ("file://" + self._dir).encode(), ctypes.byref(_CB), 0, 0)
        if not self._c:
            raise RuntimeError("fmi2Instantiate failed")
        self._nx = len(self.states)

    # ---- lifecycle ----

    def setup(self, t0=0.0, tol=None, t_stop=None):
        L = self._lib
        if self.v3:
            L.fmi3EnterInitializationMode(
                self._c, int(tol is not None), tol or 0.0, t0,
                int(t_stop is not None), t_stop or 0.0)
            L.fmi3ExitInitializationMode(self._c)
            return
        L.fmi2SetupExperiment.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_double]
        L.fmi2SetupExperiment(self._c, int(tol is not None), tol or 0.0,
                              t0, int(t_stop is not None), t_stop or 0.0)
        L.fmi2EnterInitializationMode.argtypes = [ctypes.c_void_p]
        L.fmi2ExitInitializationMode.argtypes = [ctypes.c_void_p]
        L.fmi2EnterInitializationMode(self._c)
        L.fmi2ExitInitializationMode(self._c)

    def terminate(self):
        if self._c:
            if self.v3:
                self._lib.fmi3Terminate(self._c)
                self._lib.fmi3FreeInstance(self._c)
            else:
                self._lib.fmi2Terminate.argtypes = [ctypes.c_void_p]
                self._lib.fmi2FreeInstance.argtypes = [ctypes.c_void_p]
                self._lib.fmi2Terminate(self._c)
                self._lib.fmi2FreeInstance(self._c)
            self._c = None
        shutil.rmtree(self._dir, ignore_errors=True)

    # ---- variable access ----

    def _vrs(self, names):
        return (ctypes.c_uint * len(names))(
            *[self.variables[n].vr for n in names])

    def set_real(self, names, values):
        vr = self._vrs(names)
        vals = (ctypes.c_double * len(names))(*[float(v) for v in values])
        if self.v3:
            self._lib.fmi3SetFloat64(self._c, vr, len(names), vals,
                                     len(names))
        else:
            self._lib.fmi2SetReal(self._c, vr, len(names), vals)

    def get_real(self, names):
        vr = self._vrs(names)
        out = (ctypes.c_double * len(names))()
        if self.v3:
            self._lib.fmi3GetFloat64(self._c, vr, len(names), out,
                                     len(names))
        else:
            self._lib.fmi2GetReal(self._c, vr, len(names), out)
        return np.asarray(out[:], np.float64)

    # ---- model exchange ----

    def set_time(self, t):
        if self.v3:
            self._lib.fmi3SetTime(self._c, float(t))
            return
        self._lib.fmi2SetTime.argtypes = [ctypes.c_void_p, ctypes.c_double]
        self._lib.fmi2SetTime(self._c, float(t))

    def set_states(self, x):
        arr = (ctypes.c_double * self._nx)(*[float(v) for v in x])
        if self.v3:
            self._lib.fmi3SetContinuousStates(self._c, arr, self._nx)
        else:
            self._lib.fmi2SetContinuousStates(self._c, arr, self._nx)

    def get_states(self):
        arr = (ctypes.c_double * self._nx)()
        if self.v3:
            self._lib.fmi3GetContinuousStates(self._c, arr, self._nx)
        else:
            self._lib.fmi2GetContinuousStates(self._c, arr, self._nx)
        return np.asarray(arr[:], np.float64)

    def get_derivatives(self):
        arr = (ctypes.c_double * self._nx)()
        if self.v3:
            self._lib.fmi3GetContinuousStateDerivatives(self._c, arr,
                                                        self._nx)
        else:
            self._lib.fmi2GetDerivatives(self._c, arr, self._nx)
        return np.asarray(arr[:], np.float64)

    def derivative(self, t, x, u=None):
        """f(t, x, u) for the external-ODE coupling."""
        self.set_time(t)
        self.set_states(np.asarray(x, np.float64))
        if u is not None and len(self.inputs):
            self.set_real(self.inputs, np.asarray(u, np.float64))
        return self.get_derivatives()

    # ---- co-simulation ----

    def do_step(self, t, h):
        if self.v3:
            ev = ctypes.c_int(0)
            term = ctypes.c_int(0)
            early = ctypes.c_int(0)
            lastT = ctypes.c_double(0.0)
            rc = self._lib.fmi3DoStep(
                self._c, float(t), float(h), 1, ctypes.byref(ev),
                ctypes.byref(term), ctypes.byref(early),
                ctypes.byref(lastT))
            if rc != 0:
                raise RuntimeError(f"fmi3DoStep returned {rc}")
            return
        self._lib.fmi2DoStep.argtypes = [
            ctypes.c_void_p, ctypes.c_double, ctypes.c_double, ctypes.c_int]
        rc = self._lib.fmi2DoStep(self._c, float(t), float(h), 1)
        if rc != 0:
            raise RuntimeError(f"fmi2DoStep returned {rc}")


def make_fmu_ode(fmu: Fmu):
    """Wrap a model-exchange FMU as ``f(t, x, u) -> dx`` callable from
    traced code via ``jax.pure_callback`` (the FMU is host-side C)."""
    import jax
    import jax.numpy as jnp

    nx = len(fmu.states)

    def host(t, x, u):
        return fmu.derivative(float(t), np.asarray(x),
                              np.asarray(u)).astype(np.float32)

    def f(t, x, u=None):
        if u is None:
            u = jnp.zeros((len(fmu.inputs),), jnp.float32)
        return jax.pure_callback(
            host, jax.ShapeDtypeStruct((nx,), jnp.float32), t, x, u,
            vmap_method="sequential")

    return f


# --------------------------------------------------------------------------
# export: LTI block → FMU (C source + g++)
# --------------------------------------------------------------------------

_C_TEMPLATE = r"""
#include <string.h>
#include <stdlib.h>

#define NX %(nx)d
#define NU %(nu)d
#define NY %(ny)d

static const double A[NX][NX] = %(A)s;
static const double B[NX][NU] = %(B)s;
static const double C_[NY][NX] = %(C)s;
static const double D_[NY][NU] = %(D)s;
static const double X0[NX] = %(x0)s;

typedef struct { double t; double x[NX]; double u[NU]; } Inst;

static void deriv(const double* x, const double* u, double* dx) {
    for (int i = 0; i < NX; ++i) {
        double s = 0.0;
        for (int j = 0; j < NX; ++j) s += A[i][j] * x[j];
        for (int j = 0; j < NU; ++j) s += B[i][j] * u[j];
        dx[i] = s;
    }
}

static void output(const double* x, const double* u, double* y) {
    for (int i = 0; i < NY; ++i) {
        double s = 0.0;
        for (int j = 0; j < NX; ++j) s += C_[i][j] * x[j];
        for (int j = 0; j < NU; ++j) s += D_[i][j] * u[j];
        y[i] = s;
    }
}

#define EXPORT extern "C" __attribute__((visibility("default")))

EXPORT const char* fmi2GetTypesPlatform() { return "default"; }
EXPORT const char* fmi2GetVersion() { return "2.0"; }
EXPORT void* fmi2Instantiate(const char* name, int type, const char* guid,
                             const char* loc, const void* cb, int vis,
                             int logging) {
    Inst* c = (Inst*)calloc(1, sizeof(Inst));
    memcpy(c->x, X0, sizeof(X0));
    return c;
}
EXPORT void fmi2FreeInstance(void* c) { free(c); }
EXPORT int fmi2SetupExperiment(void* c, int tolDef, double tol, double t0,
                               int stopDef, double tstop) {
    ((Inst*)c)->t = t0; return 0;
}
EXPORT int fmi2EnterInitializationMode(void* c) { return 0; }
EXPORT int fmi2ExitInitializationMode(void* c) { return 0; }
EXPORT int fmi2Terminate(void* c) { return 0; }
EXPORT int fmi2Reset(void* c) {
    Inst* m = (Inst*)c; m->t = 0; memcpy(m->x, X0, sizeof(X0));
    memset(m->u, 0, sizeof(m->u)); return 0;
}
/* vr map: states 0.., inputs 100.., outputs 200.., derivatives 300.. */
EXPORT int fmi2GetReal(void* c, const unsigned* vr, size_t n, double* v) {
    Inst* m = (Inst*)c;
    double y[NY > 0 ? NY : 1]; double dx[NX];
    output(m->x, m->u, y);
    deriv(m->x, m->u, dx);
    for (size_t i = 0; i < n; ++i) {
        unsigned r = vr[i];
        if (r < 100) v[i] = m->x[r];
        else if (r < 200) v[i] = m->u[r - 100];
        else if (r < 300) v[i] = y[r - 200];
        else v[i] = dx[r - 300];
    }
    return 0;
}
EXPORT int fmi2SetReal(void* c, const unsigned* vr, size_t n,
                       const double* v) {
    Inst* m = (Inst*)c;
    for (size_t i = 0; i < n; ++i) {
        unsigned r = vr[i];
        if (r < 100) m->x[r] = v[i];
        else if (r < 200) m->u[r - 100] = v[i];
    }
    return 0;
}
EXPORT int fmi2GetInteger(void* c, const unsigned* vr, size_t n, int* v) { return 0; }
EXPORT int fmi2SetInteger(void* c, const unsigned* vr, size_t n, const int* v) { return 0; }
EXPORT int fmi2GetBoolean(void* c, const unsigned* vr, size_t n, int* v) { return 0; }
EXPORT int fmi2SetBoolean(void* c, const unsigned* vr, size_t n, const int* v) { return 0; }
EXPORT int fmi2GetString(void* c, const unsigned* vr, size_t n, const char** v) { return 0; }
EXPORT int fmi2SetString(void* c, const unsigned* vr, size_t n, const char** v) { return 0; }

/* ---- model exchange ---- */
EXPORT int fmi2SetTime(void* c, double t) { ((Inst*)c)->t = t; return 0; }
EXPORT int fmi2SetContinuousStates(void* c, const double* x, size_t nx) {
    memcpy(((Inst*)c)->x, x, nx * sizeof(double)); return 0;
}
EXPORT int fmi2GetContinuousStates(void* c, double* x, size_t nx) {
    memcpy(x, ((Inst*)c)->x, nx * sizeof(double)); return 0;
}
EXPORT int fmi2GetDerivatives(void* c, double* dx, size_t nx) {
    Inst* m = (Inst*)c; deriv(m->x, m->u, dx); return 0;
}
EXPORT int fmi2GetNominalsOfContinuousStates(void* c, double* z, size_t n) {
    for (size_t i = 0; i < n; ++i) z[i] = 1.0; return 0;
}
EXPORT int fmi2GetEventIndicators(void* c, double* z, size_t n) { return 0; }
EXPORT int fmi2EnterEventMode(void* c) { return 0; }
EXPORT int fmi2NewDiscreteStates(void* c, void* info) { return 0; }
EXPORT int fmi2EnterContinuousTimeMode(void* c) { return 0; }
EXPORT int fmi2CompletedIntegratorStep(void* c, int noSet, int* enterEvent,
                                       int* terminate) {
    if (enterEvent) *enterEvent = 0;
    if (terminate) *terminate = 0;
    return 0;
}

/* ---- co-simulation: internal RK4 ---- */
EXPORT int fmi2DoStep(void* c, double t, double h, int noPrior) {
    Inst* m = (Inst*)c;
    int nsub = 1 + (int)(h / 1e-3);
    double dt = h / nsub;
    double k1[NX], k2[NX], k3[NX], k4[NX], tmp[NX];
    for (int s = 0; s < nsub; ++s) {
        deriv(m->x, m->u, k1);
        for (int i = 0; i < NX; ++i) tmp[i] = m->x[i] + 0.5 * dt * k1[i];
        deriv(tmp, m->u, k2);
        for (int i = 0; i < NX; ++i) tmp[i] = m->x[i] + 0.5 * dt * k2[i];
        deriv(tmp, m->u, k3);
        for (int i = 0; i < NX; ++i) tmp[i] = m->x[i] + dt * k3[i];
        deriv(tmp, m->u, k4);
        for (int i = 0; i < NX; ++i)
            m->x[i] += dt / 6.0 * (k1[i] + 2 * k2[i] + 2 * k3[i] + k4[i]);
    }
    m->t = t + h;
    return 0;
}
"""


_C3_TEMPLATE = r"""
/* FMI 3.0 flavor of the same LTI block (fmi3 C API subset). */
#include <string.h>
#include <stdlib.h>

#define NX %(nx)d
#define NU %(nu)d
#define NY %(ny)d

static const double A[NX][NX] = %(A)s;
static const double B[NX][NU] = %(B)s;
static const double C_[NY][NX] = %(C)s;
static const double D_[NY][NU] = %(D)s;
static const double X0[NX] = %(x0)s;

typedef struct { double t; double x[NX]; double u[NU]; } Inst;

static void deriv(const double* x, const double* u, double* dx) {
    for (int i = 0; i < NX; ++i) {
        double s = 0.0;
        for (int j = 0; j < NX; ++j) s += A[i][j] * x[j];
        for (int j = 0; j < NU; ++j) s += B[i][j] * u[j];
        dx[i] = s;
    }
}
static void output(const double* x, const double* u, double* y) {
    for (int i = 0; i < NY; ++i) {
        double s = 0.0;
        for (int j = 0; j < NX; ++j) s += C_[i][j] * x[j];
        for (int j = 0; j < NU; ++j) s += D_[i][j] * u[j];
        y[i] = s;
    }
}

#define EXPORT extern "C" __attribute__((visibility("default")))

EXPORT const char* fmi3GetVersion() { return "3.0"; }
static Inst* make_inst() {
    Inst* c = (Inst*)calloc(1, sizeof(Inst));
    memcpy(c->x, X0, sizeof(X0));
    return c;
}
EXPORT void* fmi3InstantiateModelExchange(
        const char* name, const char* token, const char* res, int visible,
        int logging, void* env, void* logMessage) {
    return make_inst();
}
EXPORT void* fmi3InstantiateCoSimulation(
        const char* name, const char* token, const char* res, int visible,
        int logging, int eventMode, int earlyReturn, const unsigned* reqVr,
        size_t nReq, void* env, void* intermediateUpdate) {
    return make_inst();
}
EXPORT void fmi3FreeInstance(void* c) { free(c); }
EXPORT int fmi3EnterInitializationMode(void* c, int tolDef, double tol,
                                       double t0, int stopDef,
                                       double tstop) {
    ((Inst*)c)->t = t0; return 0;
}
EXPORT int fmi3ExitInitializationMode(void* c) { return 0; }
EXPORT int fmi3EnterContinuousTimeMode(void* c) { return 0; }
EXPORT int fmi3Terminate(void* c) { return 0; }
EXPORT int fmi3Reset(void* c) {
    Inst* m = (Inst*)c; m->t = 0; memcpy(m->x, X0, sizeof(X0));
    memset(m->u, 0, sizeof(m->u)); return 0;
}
/* vr map identical to the fmi2 export: states 0.., inputs 100..,
   outputs 200.., derivatives 300.. */
EXPORT int fmi3GetFloat64(void* c, const unsigned* vr, size_t nvr,
                          double* v, size_t nv) {
    Inst* m = (Inst*)c;
    double y[NY > 0 ? NY : 1]; double dx[NX];
    output(m->x, m->u, y);
    deriv(m->x, m->u, dx);
    for (size_t i = 0; i < nvr; ++i) {
        unsigned r = vr[i];
        if (r < 100) v[i] = m->x[r];
        else if (r < 200) v[i] = m->u[r - 100];
        else if (r < 300) v[i] = y[r - 200];
        else v[i] = dx[r - 300];
    }
    return 0;
}
EXPORT int fmi3SetFloat64(void* c, const unsigned* vr, size_t nvr,
                          const double* v, size_t nv) {
    Inst* m = (Inst*)c;
    for (size_t i = 0; i < nvr; ++i) {
        unsigned r = vr[i];
        if (r < 100) m->x[r] = v[i];
        else if (r < 200) m->u[r - 100] = v[i];
    }
    return 0;
}
EXPORT int fmi3SetTime(void* c, double t) { ((Inst*)c)->t = t; return 0; }
EXPORT int fmi3SetContinuousStates(void* c, const double* x, size_t nx) {
    memcpy(((Inst*)c)->x, x, nx * sizeof(double)); return 0;
}
EXPORT int fmi3GetContinuousStates(void* c, double* x, size_t nx) {
    memcpy(x, ((Inst*)c)->x, nx * sizeof(double)); return 0;
}
EXPORT int fmi3GetContinuousStateDerivatives(void* c, double* dx,
                                             size_t nx) {
    Inst* m = (Inst*)c; deriv(m->x, m->u, dx); return 0;
}
EXPORT int fmi3GetNominalsOfContinuousStates(void* c, double* z, size_t n) {
    for (size_t i = 0; i < n; ++i) z[i] = 1.0; return 0;
}
EXPORT int fmi3CompletedIntegratorStep(void* c, int noSet, int* enterEvent,
                                       int* terminate) {
    if (enterEvent) *enterEvent = 0;
    if (terminate) *terminate = 0;
    return 0;
}
EXPORT int fmi3DoStep(void* c, double t, double h, int noPrior,
                      int* eventNeeded, int* terminate, int* earlyReturn,
                      double* lastT) {
    Inst* m = (Inst*)c;
    int nsub = 1 + (int)(h / 1e-3);
    double dt = h / nsub;
    double k1[NX], k2[NX], k3[NX], k4[NX], tmp[NX];
    for (int s = 0; s < nsub; ++s) {
        deriv(m->x, m->u, k1);
        for (int i = 0; i < NX; ++i) tmp[i] = m->x[i] + 0.5 * dt * k1[i];
        deriv(tmp, m->u, k2);
        for (int i = 0; i < NX; ++i) tmp[i] = m->x[i] + 0.5 * dt * k2[i];
        deriv(tmp, m->u, k3);
        for (int i = 0; i < NX; ++i) tmp[i] = m->x[i] + dt * k3[i];
        deriv(tmp, m->u, k4);
        for (int i = 0; i < NX; ++i)
            m->x[i] += dt / 6.0 * (k1[i] + 2 * k2[i] + 2 * k3[i] + k4[i]);
    }
    m->t = t + h;
    if (eventNeeded) *eventNeeded = 0;
    if (terminate) *terminate = 0;
    if (earlyReturn) *earlyReturn = 0;
    if (lastT) *lastT = m->t;
    return 0;
}
"""


def _c_mat(a):
    a = np.atleast_2d(np.asarray(a, np.float64))
    rows = ", ".join("{" + ", ".join(repr(float(v)) for v in row) + "}"
                     for row in a)
    return "{" + rows + "}"


def export_fmu_lti3(path, A, B=None, C=None, D=None, x0=None,
                    model_name="lti_block"):
    """FMI 3.0 flavor of :func:`export_fmu_lti` (fmi3 C API,
    `<Float64>` variable schema, `binaries/x86_64-linux` layout —
    /root/reference/src/chrono_fmi/fmi3/ChFmuToolsExport.h role)."""
    A = np.atleast_2d(np.asarray(A, np.float64))
    nx = A.shape[0]
    B = np.zeros((nx, 1)) if B is None else np.atleast_2d(B)
    nu = B.shape[1]
    C = np.eye(nx) if C is None else np.atleast_2d(C)
    ny = C.shape[0]
    D = np.zeros((ny, nu)) if D is None else np.atleast_2d(D)
    x0 = np.zeros(nx) if x0 is None else np.asarray(x0, np.float64)

    token = "{chrono-tpu-lti3-%08x}" % (abs(hash((model_name, nx, nu, ny)))
                                        & 0xFFFFFFFF)
    src = _C3_TEMPLATE % dict(
        nx=nx, nu=max(nu, 1), ny=max(ny, 1), A=_c_mat(A), B=_c_mat(B),
        C=_c_mat(C), D=_c_mat(D),
        x0="{" + ", ".join(repr(float(v)) for v in x0) + "}")

    lines = []
    for i in range(nx):
        lines.append(
            f'    <Float64 name="x{i}" valueReference="{i}" '
            f'causality="local" start="{float(x0[i])!r}"/>')
    for i in range(nu):
        lines.append(
            f'    <Float64 name="u{i}" valueReference="{100 + i}" '
            f'causality="input" variability="continuous" start="0.0"/>')
    for i in range(ny):
        lines.append(
            f'    <Float64 name="y{i}" valueReference="{200 + i}" '
            f'causality="output"/>')
    for i in range(nx):
        lines.append(
            f'    <Float64 name="der(x{i})" valueReference="{300 + i}" '
            f'causality="local" derivative="{i}"/>')
    outs = "\n".join(f'    <Output valueReference="{200 + i}"/>'
                     for i in range(ny))
    ders = "\n".join(
        f'    <ContinuousStateDerivative valueReference="{300 + i}"/>'
        for i in range(nx))
    xml = f"""<?xml version="1.0" encoding="UTF-8"?>
<fmiModelDescription fmiVersion="3.0" modelName="{model_name}"
  instantiationToken="{token}">
  <ModelExchange modelIdentifier="{model_name}"/>
  <CoSimulation modelIdentifier="{model_name}"/>
  <ModelVariables>
{chr(10).join(lines)}
  </ModelVariables>
  <ModelStructure>
{outs}
{ders}
  </ModelStructure>
</fmiModelDescription>
"""

    with tempfile.TemporaryDirectory() as td:
        cpath = os.path.join(td, "model.cpp")
        with open(cpath, "w") as f:
            f.write(src)
        sodir = os.path.join(td, "binaries", "x86_64-linux")
        os.makedirs(sodir)
        so = os.path.join(sodir, model_name + ".so")
        subprocess.run(["g++", "-shared", "-fPIC", "-O2", "-o", so, cpath],
                       check=True, capture_output=True)
        with open(os.path.join(td, "modelDescription.xml"), "w") as f:
            f.write(xml)
        with zipfile.ZipFile(path, "w") as z:
            z.write(os.path.join(td, "modelDescription.xml"),
                    "modelDescription.xml")
            z.write(so, f"binaries/x86_64-linux/{model_name}.so")
    return path


def export_fmu_lti(path, A, B=None, C=None, D=None, x0=None,
                   model_name="lti_block"):
    """Write a standard-layout FMI 2.0 FMU for ẋ = Ax + Bu, y = Cx + Du
    (model-exchange AND co-simulation), compiling the generated C with g++.
    """
    A = np.atleast_2d(np.asarray(A, np.float64))
    nx = A.shape[0]
    B = np.zeros((nx, 1)) if B is None else np.atleast_2d(B)
    nu = B.shape[1]
    C = np.eye(nx) if C is None else np.atleast_2d(C)
    ny = C.shape[0]
    D = np.zeros((ny, nu)) if D is None else np.atleast_2d(D)
    x0 = np.zeros(nx) if x0 is None else np.asarray(x0, np.float64)

    guid = "{chrono-tpu-lti-%08x}" % (abs(hash((model_name, nx, nu, ny)))
                                      & 0xFFFFFFFF)
    src = _C_TEMPLATE % dict(
        nx=nx, nu=max(nu, 1), ny=max(ny, 1), A=_c_mat(A), B=_c_mat(B),
        C=_c_mat(C), D=_c_mat(D),
        x0="{" + ", ".join(repr(float(v)) for v in x0) + "}")

    # modelDescription.xml
    def var(name, vr, causality, start=None, derivative=None):
        s = f'    <ScalarVariable name="{name}" valueReference="{vr}"'
        s += f' causality="{causality}"'
        if causality in ("input",):
            s += ' variability="continuous"'
        s += ">\n      <Real"
        if start is not None:
            s += f' start="{start!r}"'
        if derivative is not None:
            s += f' derivative="{derivative}"'
        s += "/>\n    </ScalarVariable>"
        return s

    lines = []
    idx = 0
    state_idx = {}
    for i in range(nx):
        lines.append(var(f"x{i}", i, "local", start=float(x0[i])))
        idx += 1
        state_idx[i] = idx
    for i in range(nu):
        lines.append(var(f"u{i}", 100 + i, "input", start=0.0))
        idx += 1
    for i in range(ny):
        lines.append(var(f"y{i}", 200 + i, "output"))
        idx += 1
    der_first = idx + 1
    for i in range(nx):
        lines.append(var(f"der(x{i})", 300 + i, "local",
                         derivative=state_idx[i]))
        idx += 1
    der_unknowns = "\n".join(
        f'      <Unknown index="{der_first + i}"/>' for i in range(nx))
    out_idx = nx + nu
    out_unknowns = "\n".join(
        f'      <Unknown index="{out_idx + 1 + i}"/>' for i in range(ny))

    xml = f"""<?xml version="1.0" encoding="UTF-8"?>
<fmiModelDescription fmiVersion="2.0" modelName="{model_name}"
  guid="{guid}" numberOfEventIndicators="0">
  <ModelExchange modelIdentifier="{model_name}"/>
  <CoSimulation modelIdentifier="{model_name}"/>
  <ModelVariables>
{chr(10).join(lines)}
  </ModelVariables>
  <ModelStructure>
    <Outputs>
{out_unknowns}
    </Outputs>
    <Derivatives>
{der_unknowns}
    </Derivatives>
  </ModelStructure>
</fmiModelDescription>
"""

    with tempfile.TemporaryDirectory() as td:
        cpath = os.path.join(td, "model.cpp")
        with open(cpath, "w") as f:
            f.write(src)
        sodir = os.path.join(td, "binaries", "linux64")
        os.makedirs(sodir)
        so = os.path.join(sodir, model_name + ".so")
        subprocess.run(["g++", "-shared", "-fPIC", "-O2", "-o", so, cpath],
                       check=True, capture_output=True)
        with open(os.path.join(td, "modelDescription.xml"), "w") as f:
            f.write(xml)
        with zipfile.ZipFile(path, "w") as z:
            z.write(os.path.join(td, "modelDescription.xml"),
                    "modelDescription.xml")
            z.write(so, f"binaries/linux64/{model_name}.so")
    return path
