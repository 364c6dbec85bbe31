"""Import shim for running the ACTUAL reference implementation
(/root/reference, PyTorch) on CPU inside the test suite.

The reference torch code runs on CPU in this image (the CUDA extension
imports are skipped without CUDA and fall back to the pure-torch reference
kernels, src/ops/op/upfirdn2d.py:160-193, fused_act.py:92-96). Three import
blockers are stubbed — none is on the compute path we compare:

  * torchvision       — only reached via src/ops/dcn.py (deform conv, not
                        used by any shipped config) and the aug transforms
                        (non-functional in the reference: NameError on
                        aug_scale_and_p, OOD_faceGAN_e4e_arch.py:89).
  * easydict          — trivial attr-dict used to pass stylegan_size.
  * basicsr           — only ARCH_REGISTRY registration decoration and
                        trunc_normal_ init are imported by src/archs.

Nothing in the reference is executed beyond what each parity test calls.
"""

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install_reference_stubs():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    if "torchvision" not in sys.modules:
        def _unavailable(*a, **k):
            raise RuntimeError("torchvision stub: not available in tests")

        tv = _module("torchvision")
        tv.ops = _module("torchvision.ops", deform_conv2d=_unavailable)
        tv.transforms = _module(
            "torchvision.transforms",
            RandomPerspective=_unavailable, ColorJitter=_unavailable,
            Normalize=_unavailable, Resize=_unavailable)
        tv.models = _module("torchvision.models", resnet34=_unavailable)
        tv.utils = _module("torchvision.utils", save_image=_unavailable)

    if "lpips" not in sys.modules:
        def _no_lpips(*a, **k):
            raise RuntimeError("lpips stub: pip package not in this image")

        _module("lpips", LPIPS=_no_lpips)

    if "Experimental_root" not in sys.modules:
        # GCFSR_modules.py:12 imports its ops from the GCFSR repo's package
        # name, which the reference never vendored (dead path outside that
        # file). Alias it to the reference's own identical op package
        # (src/ops/op — same FusedLeakyReLU/fused_leaky_relu/upfirdn2d).
        import importlib
        op = importlib.import_module("src.ops.op")
        er = _module("Experimental_root")
        er.ops = _module("Experimental_root.ops")
        er.ops.Face_Restoration = _module(
            "Experimental_root.ops.Face_Restoration")
        sys.modules["Experimental_root.ops.Face_Restoration.op"] = op
        er.ops.Face_Restoration.op = op

    if "easydict" not in sys.modules:
        class EasyDict(dict):
            __getattr__ = dict.__getitem__

            def __setattr__(self, k, v):
                self[k] = v

        _module("easydict", EasyDict=EasyDict)

    if "basicsr" not in sys.modules:
        class _Registry:
            def register(self, obj=None, name=None):
                if obj is None:
                    return lambda o: o
                return obj

            def get(self, name):
                raise KeyError(name)

        def trunc_normal_(tensor, *a, **k):
            return tensor

        import os

        def scandir(dir_path, suffix=None, recursive=False, full_path=False):
            for entry in sorted(os.listdir(dir_path)):
                if suffix is None or entry.endswith(suffix):
                    yield entry if not full_path else os.path.join(
                        dir_path, entry)

        import logging

        bs = _module("basicsr", get_root_logger=lambda *a, **k:
                     logging.getLogger("ref_compat"))
        bs.utils = _module("basicsr.utils", scandir=scandir)
        bs.utils.registry = _module(
            "basicsr.utils.registry",
            ARCH_REGISTRY=_Registry(), MODEL_REGISTRY=_Registry(),
            DATASET_REGISTRY=_Registry(), LOSS_REGISTRY=_Registry(),
            METRIC_REGISTRY=_Registry())
        bs.archs = _module("basicsr.archs")
        bs.archs.arch_util = _module("basicsr.archs.arch_util",
                                     trunc_normal_=trunc_normal_)
        # the REAL loss_util (torch-only imports) so golden loss tests run
        # the reference's actual reduction code, not a re-implementation
        bs.losses = _module("basicsr.losses")
        import importlib.util as _ilu
        spec = _ilu.spec_from_file_location(
            "basicsr.losses.loss_util",
            f"{REFERENCE_ROOT}/BasicSR/basicsr/losses/loss_util.py")
        lu = _ilu.module_from_spec(spec)
        spec.loader.exec_module(lu)
        sys.modules["basicsr.losses.loss_util"] = lu
        bs.losses.loss_util = lu


def load_reference_module(name):
    """Import a reference module (e.g. 'src.ops.StyleGAN.model') with the
    stubs installed."""
    install_reference_stubs()
    import importlib
    return importlib.import_module(name)


def load_real_basicsr(name):
    """Load a REAL BasicSR module file (torch/numpy/cv2-only leaves like
    metrics/matlab_functions) under the stubbed `basicsr` package, so golden
    tests exercise the reference's actual metric code without pulling the
    framework's heavy import graph. Dependencies must be loaded first
    (callers pass leaf-most last)."""
    install_reference_stubs()
    if name in sys.modules:
        return sys.modules[name]
    parts = name.split(".")
    for i in range(1, len(parts)):
        pname = ".".join(parts[:i])
        if pname not in sys.modules:
            _module(pname)
    path = f"{REFERENCE_ROOT}/BasicSR/{'/'.join(parts)}.py"
    import importlib.util as ilu
    spec = ilu.spec_from_file_location(name, path)
    mod = ilu.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    setattr(sys.modules[".".join(parts[:-1])], parts[-1], mod)
    return mod


class zero_noise_injection:
    """Context manager: make the reference StyleGAN NoiseInjection draw ZERO
    noise when none is passed (model.py:283-292 draws randn). With zero
    noise both implementations compute identical deterministic programs:
    uncond layers add weight*0, conditioned layers reduce to out = aligned
    exactly ((aligned - image + 0*w)/w fed back as image + w*cond).

    Noise WEIGHTS must be non-zero for the callback algebra (the reference
    divides by them); randomize them on the torch module before converting.
    """

    def __enter__(self):
        import torch
        model = load_reference_module("src.ops.StyleGAN.model")
        self._model = model
        self._orig = model.NoiseInjection.forward

        def forward(mod, image, noise=None, **kwargs):
            if noise is None:
                b, _, h, w = image.shape
                noise = image.new_zeros(b, 1, h, w)
                if kwargs.get("callback", None):
                    kwargs.update({"noise_weight": mod.weight, "noise": noise})
                    noise = kwargs.get("callback")(image, **kwargs)
            return image + mod.weight * noise

        model.NoiseInjection.forward = forward
        return self

    def __exit__(self, *exc):
        self._model.NoiseInjection.forward = self._orig
        return False


def to_nhwc(t):
    import numpy as np
    a = t.detach().cpu().numpy()
    if a.ndim == 4:
        a = np.transpose(a, (0, 2, 3, 1))
    return a


def from_nhwc(a):
    import torch
    import numpy as np
    a = np.asarray(a)
    if a.ndim == 4:
        a = np.transpose(a, (0, 3, 1, 2))
    t = torch.from_numpy(np.ascontiguousarray(a)).float()
    if t.ndim == 4:
        # numpy leaves size-1 dims with their pre-transpose strides (C=1 ->
        # channel stride 1), which torch reads as channels_last and then
        # propagates through convs until a reference-side .view rejects it;
        # clone to canonical NCHW strides
        t = t.clone(memory_format=torch.contiguous_format)
    return t
