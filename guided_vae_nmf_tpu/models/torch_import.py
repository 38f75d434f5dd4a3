"""Import reference PyTorch checkpoints into this framework's pytrees.

The reference saves `model.state_dict()` every epoch under names like
`M1_epoch_{e:03d}_vloss_{v:.2f}.pt` (reference scripts/training_M1.py:143-145).
This module maps those state_dicts onto our (in, out)-layout parameter trees
so existing trained checkpoints remain usable. torch is only required when a
.pt file is actually imported; arrays come back as numpy and are fed to jnp
lazily.
"""

import numpy as np


def _t(w):
    """torch Linear stores weight (out, in); we store (in, out)."""
    return np.ascontiguousarray(np.asarray(w).T)


def _load_state_dict(path_or_dict):
    if isinstance(path_or_dict, dict):
        sd = path_or_dict
    else:
        import torch

        sd = torch.load(path_or_dict, map_location="cpu")
    return {k: np.asarray(v) for k, v in sd.items()}


def _mlp_from(sd, prefix, n_layers):
    return [
        {"w": _t(sd[f"{prefix}.{i}.weight"]), "b": np.asarray(sd[f"{prefix}.{i}.bias"])}
        for i in range(n_layers)
    ]


def _count_layers(sd, prefix):
    n = 0
    while f"{prefix}.{n}.weight" in sd:
        n += 1
    return n


def import_vae(path_or_dict):
    """Map a VariationalAutoencoder / DeepGenerativeModel state_dict (keys
    encoder.hidden.N.*, encoder.sample.{mu,log_var}.*, decoder.hidden.N.*,
    decoder.reconstruction.*; reference models.py:90-133,184-198) onto our
    vae/dgm param tree. M2 checkpoints yield a tree usable by dgm_apply once
    the caller attaches y_dim."""
    sd = _load_state_dict(path_or_dict)
    enc_layers = _count_layers(sd, "encoder.hidden")
    dec_layers = _count_layers(sd, "decoder.hidden")
    params = {
        "encoder": {
            "hidden": _mlp_from(sd, "encoder.hidden", enc_layers),
            "mu": {
                "w": _t(sd["encoder.sample.mu.weight"]),
                "b": np.asarray(sd["encoder.sample.mu.bias"]),
            },
            "log_var": {
                "w": _t(sd["encoder.sample.log_var.weight"]),
                "b": np.asarray(sd["encoder.sample.log_var.bias"]),
            },
        },
        "decoder": {
            "hidden": _mlp_from(sd, "decoder.hidden", dec_layers),
            "out": {
                "w": _t(sd["decoder.reconstruction.weight"]),
                "b": np.asarray(sd["decoder.reconstruction.bias"]),
            },
        },
    }
    return params


def import_dgm(path_or_dict, y_dim):
    """Import an M2 checkpoint and record its label dimensionality."""
    params = import_vae(path_or_dict)
    params["y_dim"] = y_dim
    return params


def import_classifier(path_or_dict):
    """Map a Classifier state_dict (hidden.N.*, output_layer.*; reference
    models.py:41-62) onto our classifier param tree."""
    sd = _load_state_dict(path_or_dict)
    n = _count_layers(sd, "hidden")
    return {
        "hidden": _mlp_from(sd, "hidden", n),
        "out": {
            "w": _t(sd["output_layer.weight"]),
            "b": np.asarray(sd["output_layer.bias"]),
        },
        "batch_norm": False,
    }


def export_vae(params):
    """Inverse mapping: our vae/dgm tree -> a torch-loadable state_dict of
    numpy arrays (reference key naming)."""
    sd = {}
    for i, l in enumerate(params["encoder"]["hidden"]):
        sd[f"encoder.hidden.{i}.weight"] = _t(l["w"])
        sd[f"encoder.hidden.{i}.bias"] = np.asarray(l["b"])
    sd["encoder.sample.mu.weight"] = _t(params["encoder"]["mu"]["w"])
    sd["encoder.sample.mu.bias"] = np.asarray(params["encoder"]["mu"]["b"])
    sd["encoder.sample.log_var.weight"] = _t(params["encoder"]["log_var"]["w"])
    sd["encoder.sample.log_var.bias"] = np.asarray(
        params["encoder"]["log_var"]["b"]
    )
    for i, l in enumerate(params["decoder"]["hidden"]):
        sd[f"decoder.hidden.{i}.weight"] = _t(l["w"])
        sd[f"decoder.hidden.{i}.bias"] = np.asarray(l["b"])
    sd["decoder.reconstruction.weight"] = _t(params["decoder"]["out"]["w"])
    sd["decoder.reconstruction.bias"] = np.asarray(
        params["decoder"]["out"]["b"]
    )
    return sd


def record_reference_stream(seed, F, N, L, cfg):
    """Replay torch's global-RNG stream for one reference MCEM_M2/M1 run.

    Seeding torch with `seed` and drawing in the reference engine's exact
    consumption order (mcem.py: init_parameters rand(F,K), rand(K,N);
    then niter E-chains of nsamples+burnin x [randn(L,N), rand(N)]
    (mcem.py:257,271); then one WF chain of nsamples_WF+burnin_WF steps)
    yields bit-identical values to what a reference run launched from the
    same `torch.manual_seed(seed)` consumes. Returned as numpy for the
    full-run fixed-randomness mode (`mcem_run(noise=..., init_nmf=...)`),
    which turns the engine-vs-engine comparison into a PAIRED,
    randomness-free numerical one (validate_parity.py --engine paired).

    Returns (W0, H0, g0, (Zn_E, U_E, Zn_WF, U_WF)).
    """
    import torch

    torch.manual_seed(seed)
    K = cfg.nmf_rank
    W0 = np.maximum(torch.rand(F, K).numpy(), cfg.eps)
    H0 = np.maximum(torch.rand(K, N).numpy(), cfg.eps)
    g0 = np.ones((N,), np.float32)
    # init_parameters' Z0 = encoder(...) consumes one randn(N, L) in
    # GaussianSample.reparametrize (models.py:8-14) even though only mu
    # is kept — advance the stream past it
    torch.randn(N, L)

    def chain(steps):
        zn = np.empty((steps, L, N), np.float32)
        u = np.empty((steps, N), np.float32)
        for m in range(steps):  # call-by-call: torch's normal cache and
            # the randn/rand interleaving make one big batched draw a
            # DIFFERENT stream than the reference's per-step calls
            zn[m] = torch.randn(L, N).numpy()
            u[m] = torch.rand(N).numpy()
        return zn, u

    s_e = cfg.nsamples_E_step + cfg.burnin_E_step
    zn_e = np.empty((cfg.niter, s_e, L, N), np.float32)
    u_e = np.empty((cfg.niter, s_e, N), np.float32)
    for n in range(cfg.niter):
        zn_e[n], u_e[n] = chain(s_e)
    zn_wf, u_wf = chain(cfg.nsamples_WF + cfg.burnin_WF)
    return W0, H0, g0, (zn_e, u_e, zn_wf, u_wf)
