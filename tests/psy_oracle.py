"""ctypes bridge to the reference psy functions (per-function golden
oracle for developing the Python/JAX psy model).

Builds real vorbis_info_psy / vorbis_info_psy_global C structs from our
encsetup products and calls the exported _vp_* functions of the
compiled reference lib directly.
"""

from __future__ import annotations

import ctypes as C

import numpy as np

from tests import oracle

P_BANDS = 17
P_NOISECURVES = 3
NCL = 40
PACKETBLOBS = 15
VE_BANDS = 12


class vorbis_info_psy(C.Structure):
    _fields_ = [
        ("blockflag", C.c_int),
        ("ath_adjatt", C.c_float),
        ("ath_maxatt", C.c_float),
        ("tone_masteratt", C.c_float * P_NOISECURVES),
        ("tone_centerboost", C.c_float),
        ("tone_decay", C.c_float),
        ("tone_abs_limit", C.c_float),
        ("toneatt", C.c_float * P_BANDS),
        ("noisemaskp", C.c_int),
        ("noisemaxsupp", C.c_float),
        ("noisewindowlo", C.c_float),
        ("noisewindowhi", C.c_float),
        ("noisewindowlomin", C.c_int),
        ("noisewindowhimin", C.c_int),
        ("noisewindowfixed", C.c_int),
        ("noiseoff", (C.c_float * P_BANDS) * P_NOISECURVES),
        ("noisecompand", C.c_float * NCL),
        ("noisecompand_high", C.c_float * NCL),
        ("flacint", C.c_float),
        ("max_curve_dB", C.c_float),
        ("normal_p", C.c_int),
        ("normal_start", C.c_int),
        ("normal_partition", C.c_int),
        ("normal_thresh", C.c_double),
    ]


class vorbis_info_psy_global(C.Structure):
    _fields_ = [
        ("eighth_octave_lines", C.c_int),
        ("preecho_thresh", C.c_float * VE_BANDS),
        ("postecho_thresh", C.c_float * VE_BANDS),
        ("stretch_penalty", C.c_float),
        ("preecho_minenergy", C.c_float),
        ("ampmax_att_per_sec", C.c_float),
        ("coupling_pkHz", C.c_int * PACKETBLOBS),
        ("coupling_pointlimit", (C.c_int * PACKETBLOBS) * 2),
        ("coupling_prepointamp", C.c_int * PACKETBLOBS),
        ("coupling_postpointamp", C.c_int * PACKETBLOBS),
        ("sliding_lowpass", (C.c_int * PACKETBLOBS) * 2),
    ]


class vorbis_info_mapping0(C.Structure):
    _fields_ = [
        ("submaps", C.c_int),
        ("chmuxlist", C.c_int * 256),
        ("floorsubmap", C.c_int * 16),
        ("residuesubmap", C.c_int * 16),
        ("coupling_steps", C.c_int),
        ("coupling_mag", C.c_int * 256),
        ("coupling_ang", C.c_int * 256),
    ]


def _look():
    class _L(C.Structure):
        _fields_ = [("_blob", C.c_byte * 16384)]

    return _L()


def make_info_psy(p) -> vorbis_info_psy:
    """p: a psy param Struct from encsetup."""
    vip = vorbis_info_psy()
    vip.blockflag = p["blockflag"]
    vip.ath_adjatt = p["ath_adjatt"]
    vip.ath_maxatt = p["ath_maxatt"]
    for i in range(3):
        vip.tone_masteratt[i] = p["tone_masteratt"][i]
    vip.tone_centerboost = p["tone_centerboost"]
    vip.tone_decay = p["tone_decay"]
    vip.tone_abs_limit = p["tone_abs_limit"]
    for i in range(P_BANDS):
        vip.toneatt[i] = p["toneatt"][i]
    vip.noisemaskp = p["noisemaskp"]
    vip.noisemaxsupp = p["noisemaxsupp"]
    vip.noisewindowlo = p["noisewindowlo"]
    vip.noisewindowhi = p["noisewindowhi"]
    vip.noisewindowlomin = p["noisewindowlomin"]
    vip.noisewindowhimin = p["noisewindowhimin"]
    vip.noisewindowfixed = p["noisewindowfixed"]
    for j in range(3):
        for i in range(P_BANDS):
            vip.noiseoff[j][i] = p["noiseoff"][j][i]
    for i in range(NCL):
        vip.noisecompand[i] = p["noisecompand"][i]
        vip.noisecompand_high[i] = p["noisecompand_high"][i]
    vip.flacint = p["flacint"]
    vip.max_curve_dB = p["max_curve_dB"]
    vip.normal_p = p["normal_p"]
    vip.normal_start = p["normal_start"]
    vip.normal_partition = p["normal_partition"]
    vip.normal_thresh = p["normal_thresh"]
    return vip


def make_info_global(g) -> vorbis_info_psy_global:
    gg = vorbis_info_psy_global()
    gg.eighth_octave_lines = g["eighth_octave_lines"]
    for i in range(VE_BANDS):
        gg.preecho_thresh[i] = g["preecho_thresh"][i]
        gg.postecho_thresh[i] = g["postecho_thresh"][i]
    gg.stretch_penalty = g["stretch_penalty"]
    gg.preecho_minenergy = g["preecho_minenergy"]
    gg.ampmax_att_per_sec = g["ampmax_att_per_sec"]
    for i in range(PACKETBLOBS):
        gg.coupling_pkHz[i] = g["coupling_pkHz"][i]
        gg.coupling_prepointamp[i] = g["coupling_prepointamp"][i]
        gg.coupling_postpointamp[i] = g["coupling_postpointamp"][i]
        for b in range(2):
            gg.coupling_pointlimit[b][i] = g["coupling_pointlimit"][b][i]
            gg.sliding_lowpass[b][i] = g["sliding_lowpass"][b][i]
    return gg


def make_mapping(m, ch) -> vorbis_info_mapping0:
    mm = vorbis_info_mapping0()
    mm.submaps = m.submaps
    for c in range(ch):
        mm.chmuxlist[c] = m.chmuxlist[c]
    for s in range(m.submaps):
        mm.floorsubmap[s] = m.floorsubmap[s]
        mm.residuesubmap[s] = m.residuesubmap[s]
    mm.coupling_steps = m.coupling_steps
    for s in range(m.coupling_steps):
        mm.coupling_mag[s] = m.coupling_mag[s]
        mm.coupling_ang[s] = m.coupling_ang[s]
    return mm


class PsyOracle:
    """One reference psy look for a given (psy_params block, global, n,
    rate)."""

    def __init__(self, p, g, n, rate):
        self.lib = oracle.reflib().lib
        self.vip = make_info_psy(p)
        self.gip = make_info_global(g)
        self.lk = _look()
        self.n = n
        self.lib._vp_psy_init(C.byref(self.lk), C.byref(self.vip),
                              C.byref(self.gip), C.c_int(n), C.c_long(rate))
        self.lib._postnoise_detection.restype = C.c_float
        self.lib.lb_loudnoise_fix.restype = C.c_float
        self.lib._vp_ampmax_decay.restype = C.c_float

    def _f32(self, a):
        return np.ascontiguousarray(a, dtype=np.float32)

    def noisemask(self, logmdct, lastmdct, noise_compand_level=-1.0,
                  poste=-1.0, block_mode=3):
        n = self.n
        logmdct = self._f32(logmdct)
        lastmdct = self._f32(lastmdct)
        epeak = np.zeros(n, np.float32)
        # generously sized: the M2/M8 loops index npeak up to
        # min_nn_lp/partition which may exceed n/partition
        npeak = np.zeros(n, np.float32)
        logmask = np.zeros(n, np.float32)
        F = C.POINTER(C.c_float)
        self.lib._vp_noisemask(
            C.byref(self.lk), C.c_float(noise_compand_level),
            logmdct.ctypes.data_as(F), lastmdct.ctypes.data_as(F),
            epeak.ctypes.data_as(F), npeak.ctypes.data_as(F),
            logmask.ctypes.data_as(F), C.c_float(poste),
            C.c_int(block_mode))
        return logmask, epeak, npeak

    def tonemask(self, logfft, global_specmax, local_specmax):
        n = self.n
        logfft = self._f32(logfft)
        logmask = np.zeros(n, np.float32)
        F = C.POINTER(C.c_float)
        self.lib._vp_tonemask(C.byref(self.lk), logfft.ctypes.data_as(F),
                              logmask.ctypes.data_as(F),
                              C.c_float(global_specmax),
                              C.c_float(local_specmax))
        return logmask

    def offset_and_mix(self, noise, tone, offset_select, bit_managed,
                       mdct, logmdct, lastmdct, tempmdct, low_compand,
                       npeak, end_block, block_mode, nW_modenumber,
                       lW_block_mode, lW_no, impadnum):
        n = self.n
        F = C.POINTER(C.c_float)
        noise = self._f32(noise)
        tone = self._f32(tone)
        logmask = np.zeros(n, np.float32)
        mdct = self._f32(mdct).copy()
        logmdct = self._f32(logmdct)
        lastmdct = self._f32(lastmdct).copy()
        tempmdct = self._f32(tempmdct).copy()
        npeak = self._f32(npeak).copy()
        self.lib._vp_offset_and_mix(
            C.byref(self.lk), noise.ctypes.data_as(F),
            tone.ctypes.data_as(F), C.c_int(offset_select),
            C.c_int(bit_managed), logmask.ctypes.data_as(F),
            mdct.ctypes.data_as(F), logmdct.ctypes.data_as(F),
            lastmdct.ctypes.data_as(F), tempmdct.ctypes.data_as(F),
            C.c_float(low_compand), npeak.ctypes.data_as(F),
            C.c_int(end_block), C.c_int(block_mode),
            C.c_int(nW_modenumber), C.c_int(lW_block_mode),
            C.c_int(lW_no), C.c_int(impadnum))
        return logmask, mdct, lastmdct, tempmdct, npeak

    def postnoise_detection(self, pcm, mode, lw_mode):
        F = C.POINTER(C.c_float)
        pcm = self._f32(pcm)
        return float(self.lib._postnoise_detection(
            pcm.ctypes.data_as(F), C.c_int(len(pcm)), C.c_int(mode),
            C.c_int(lw_mode)))

    def loudnoise_fix(self, noise_compand_level, logmdct, block_mode,
                      lW_block_mode):
        F = C.POINTER(C.c_float)
        logmdct = self._f32(logmdct)
        return float(self.lib.lb_loudnoise_fix(
            C.byref(self.lk), C.c_float(noise_compand_level),
            logmdct.ctypes.data_as(F), C.c_int(block_mode),
            C.c_int(lW_block_mode)))

    def couple_quantize_normalize(self, blobno, mapping, ch, mdct,
                                  enpeak, nepeak, iwork, nonzero,
                                  sliding_lowpass, lowpassr):
        n = self.n
        F = C.POINTER(C.c_float)
        I = C.POINTER(C.c_int)
        mm = make_mapping(mapping, ch)
        mdct = [self._f32(m).copy() for m in mdct]
        enpeak = [self._f32(e).copy() for e in enpeak]
        nepeak = [self._f32(x).copy() for x in nepeak]
        iwork = [np.ascontiguousarray(w, dtype=np.int32).copy()
                 for w in iwork]
        nz = np.ascontiguousarray(nonzero, dtype=np.int32).copy()
        mdct_p = (F * ch)(*[m.ctypes.data_as(F) for m in mdct])
        enp_p = (F * ch)(*[e.ctypes.data_as(F) for e in enpeak])
        nep_p = (F * ch)(*[x.ctypes.data_as(F) for x in nepeak])
        iw_p = (I * ch)(*[w.ctypes.data_as(I) for w in iwork])
        self.lib._vp_couple_quantize_normalize(
            C.c_int(blobno), C.byref(self.gip), C.byref(self.lk),
            C.byref(mm), mdct_p, enp_p, nep_p, iw_p,
            nz.ctypes.data_as(I), C.c_int(sliding_lowpass), C.c_int(ch),
            C.c_int(lowpassr))
        return iwork, nz, nepeak
