"""Numpy/ARPACK oracle for the pairwise-consistency solver.

A direct, dynamic-shape re-statement of the semantics of the reference's
RelativePoseEstimation_helper + fit_irls_sm/fit_spectral/fit_irls/fit_horn87
(rpmodule.py:17-508), used ONLY as a test oracle to validate the factorized
TPU solver in relativepose_tpu/match/solver.py.  Written from the published
algorithm description; hosts scipy.sparse ARPACK just like the reference.
"""

import numpy as np
import scipy.sparse as sparse
from scipy.sparse import csc_matrix

FEAT_SCALING = 100.0
OBS_W = 1.2
OFFSET = 50.0
RES_SIGMA = 1.0


def horn87_np(src, tgt, weight):
    # src/tgt: [3, n]; weight: [n] applied to tgt
    tgt = tgt * weight[None, :]
    M = src @ tgt.T
    N = np.array([
        [M[0, 0] + M[1, 1] + M[2, 2], M[1, 2] - M[2, 1],
         M[2, 0] - M[0, 2], M[0, 1] - M[1, 0]],
        [M[1, 2] - M[2, 1], M[0, 0] - M[1, 1] - M[2, 2],
         M[0, 1] + M[1, 0], M[0, 2] + M[2, 0]],
        [M[2, 0] - M[0, 2], M[0, 1] + M[1, 0],
         M[1, 1] - M[0, 0] - M[2, 2], M[1, 2] + M[2, 1]],
        [M[0, 1] - M[1, 0], M[2, 0] + M[0, 2],
         M[1, 2] + M[2, 1], M[2, 2] - M[0, 0] - M[1, 1]]])
    vals, vecs = np.linalg.eig(N)
    q = vecs[:, vals.argmax()].real
    w, x, y, z = q
    return np.array([
        [w * w + x * x - y * y - z * z, 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (y * x + w * z), w * w - x * x + y * y - z * z, 2 * (y * z - w * x)],
        [2 * (z * x - w * y), 2 * (z * y + w * x), w * w - x * x - y * y + z * z]])


def _centered(allSP, allTP, allWP):
    eps = 1e-12
    sm = (allSP * allWP[:, None]).sum(0) / (allWP.sum() + eps)
    tm = (allTP * allWP[:, None]).sum(0) / (allWP.sum() + eps)
    return allSP - sm, allTP - tm, sm, tm


def fit_horn87(allSP, allTP, allSN, allTN, allWP, allWN, mu):
    sc, tc, sm, tm = _centered(allSP, allTP, allWP)
    allS = np.concatenate([sc, allSN])
    allT = np.concatenate([tc, allTN])
    allW = np.concatenate([allWP * mu, allWN])
    R = horn87_np(allS.T, allT.T, allW)
    t = -R @ sm + tm
    T = np.eye(4)
    T[:3, :3], T[:3, 3] = R, t
    return T


def fit_irls(allSP, allTP, allSN, allTN, allWP, allWN, mu,
             num_reweighted=5):
    allW = np.concatenate([allWP * mu, allWN])
    for _ in range(num_reweighted):
        WP = allW[: len(allW) // 2]
        sc, tc, sm, tm = _centered(allSP, allTP, WP)
        allS = np.concatenate([sc, allSN])
        allT = np.concatenate([tc, allTN])
        R = horn87_np(allS.T, allT.T, allW)
        t = -R @ sm + tm
        rp = mu * ((R @ sc.T - tc.T) ** 2).sum(0)
        rn = ((R @ allSN.T - allTN.T) ** 2).sum(0)
        res = np.concatenate([rp, rn])
        allW = allW * RES_SIGMA**2 / (RES_SIGMA**2 + res)
    T = np.eye(4)
    T[:3, :3], T[:3, 3] = R, t
    return T


def _leading_eigvec(a_vals, row, col, n):
    A = csc_matrix((a_vals, (row, col)), shape=(n, n))
    A = A + A.T
    vals, u = sparse.linalg.eigs(A, k=1, v0=np.ones(n))
    u = u.real.ravel()
    return u / np.linalg.norm(u)


def fit_spectral(allSP, allTP, allSN, allTN, allWP, allWN, w_pair, mu,
                 row, col, n_nodes, num_alter=5):
    sc, tc, sm, tm = _centered(allSP, allTP, allWP)
    allS = np.concatenate([sc, allSN])
    allT = np.concatenate([tc, allTN])
    allW = np.concatenate([allWP * mu, allWN])
    R = horn87_np(allS.T, allT.T, allW)
    t = -R @ sm + tm
    WP_cur = allWP.copy()
    for _ in range(num_alter):
        r = mu * ((R @ sc.T - tc.T) ** 2).sum(0) + \
            ((R @ allSN.T - allTN.T) ** 2).sum(0)
        a = WP_cur * (OFFSET - r)
        a[a < 0] = 0
        a = a.reshape(2, -1).sum(0)
        u = _leading_eigvec(a, row, col, n_nodes)
        x = u[row] * u[col]
        x[x < 0] = 0
        x = x * w_pair
        allW = np.tile(x, 4)
        allW[: len(allW) // 2] *= mu
        WP_cur = allW[: len(allW) // 2]
        sc, tc, sm, tm = _centered(allSP, allTP, WP_cur)
        allS = np.concatenate([sc, allSN])
        allT = np.concatenate([tc, allTN])
        R = horn87_np(allS.T, allT.T, allW)
        t = -R @ sm + tm
    T = np.eye(4)
    T[:3, :3], T[:3, 3] = R, t
    return T


def fit_irls_sm(allSP, allTP, allSN, allTN, allWP, allWN, w_pair, mu,
                row, col, n_nodes, num_alter=5, num_reweighted=5):
    allW = np.concatenate([allWP * mu, allWN])
    for _ in range(num_reweighted):
        WP = allW[: len(allW) // 2]
        sc, tc, sm, tm = _centered(allSP, allTP, WP)
        allS = np.concatenate([sc, allSN])
        allT = np.concatenate([tc, allTN])
        R = horn87_np(allS.T, allT.T, allW)
        t = -R @ sm + tm
        rp = mu * ((R @ sc.T - tc.T) ** 2).sum(0)
        rn = ((R @ allSN.T - allTN.T) ** 2).sum(0)
        res = np.concatenate([rp, rn])
        allW = allW * RES_SIGMA**2 / (RES_SIGMA**2 + res)
    for _ in range(num_alter):
        r = mu * ((R @ sc.T - tc.T) ** 2).sum(0) + \
            ((R @ allSN.T - allTN.T) ** 2).sum(0)
        a = np.tile(w_pair, 2) * (OFFSET - r)
        a[a < 0] = 0
        a = a.reshape(2, -1).sum(0)
        u = _leading_eigvec(a, row, col, n_nodes)
        x = u[row] * u[col]
        x[x < 0] = 0
        x = x * w_pair
        allW = np.tile(x, 4)
        allW[: len(allW) // 2] *= mu
        for _ in range(num_reweighted):
            WP = allW[: len(allW) // 2]
            sc, tc, sm, tm = _centered(allSP, allTP, WP)
            allS = np.concatenate([sc, allSN])
            allT = np.concatenate([tc, allTN])
            R = horn87_np(allS.T, allT.T, allW)
            t = -R @ sm + tm
            rp = mu * ((R @ sc.T - tc.T) ** 2).sum(0)
            rn = ((R @ allSN.T - allTN.T) ** 2).sum(0)
            res = np.concatenate([rp, rn])
            allW = allW * RES_SIGMA**2 / (RES_SIGMA**2 + res)
    T = np.eye(4)
    T[:3, :3], T[:3, 3] = R, t
    return T


def estimate_relative_pose_oracle(data_s, data_t, para):
    """para: dict with sigmaFeat/sigmaDist/sigmaAngle1/sigmaAngle2/distThre/
    distSepThre/angleThre/mu/topK/method."""
    sPC, tPC = data_s["pc"], data_t["pc"]
    sN, tN = data_s["normal"], data_t["normal"]
    sW, tW = data_s["weight"], data_t["weight"]
    sF = data_s["feat"] / FEAT_SCALING
    tF = data_t["feat"] / FEAT_SCALING

    if sPC.shape[0] < 3 or tPC.shape[0] < 3:
        return np.eye(4)
    nfs, nft = sPC.shape[0], tPC.shape[0]

    pcWij = sW[:, None] * tW[None, :]
    dij = ((sF[:, None, :] - tF[None, :, :]) ** 2).sum(2)
    sigmaij = np.full(pcWij.shape, para["sigmaFeat"])
    sigmaij[pcWij == 1] = para["sigmaFeat"] / OBS_W
    wij = np.exp(-dij / (2 * (sigmaij / 5) ** 2))
    nm = np.linalg.norm(wij, axis=1, keepdims=True)
    zero = nm == 0
    nm[zero] = 1
    wij /= nm
    wij[zero.squeeze(), :] = 0

    topK = min(para["topK"], wij.shape[1] - 1)
    topIdx = np.argpartition(-wij, topK, axis=1)[:, :topK]
    corres = np.zeros([2, nfs * topK], dtype=int)
    corres[0] = np.arange(nfs).repeat(topK)
    corres[1] = topIdx.flatten()
    nc = corres.shape[1]
    if nc < 3:
        return np.eye(4)

    idx = np.tile(np.arange(nc), nc).reshape(-1, nc)
    idy = idx.T
    v = idx > idy
    idx, idy = idx[v], idy[v]

    pci1, pcj1 = sPC[corres[0, idy]], tPC[corres[1, idy]]
    pci2, pcj2 = sPC[corres[0, idx]], tPC[corres[1, idx]]
    ni1, nj1 = sN[corres[0, idy]], tN[corres[1, idy]]
    ni2, nj2 = sN[corres[0, idx]], tN[corres[1, idx]]

    dis_s = np.linalg.norm(pci1 - pci2, axis=1)
    dis_t = np.linalg.norm(pcj1 - pcj2, axis=1)
    d2 = (dis_s - dis_t) ** 2
    keep = np.logical_and(
        d2 < para["distThre"] ** 2,
        np.minimum(dis_s, dis_t) > 1.5 * para["distSepThre"] ** 2)
    if keep.sum() < 3:
        return np.eye(4)
    idx, idy = idx[keep], idy[keep]
    pci1, pcj1, pci2, pcj2 = pci1[keep], pcj1[keep], pci2[keep], pcj2[keep]
    ni1, nj1, ni2, nj2 = ni1[keep], nj1[keep], ni2[keep], nj2[keep]
    d2 = d2[keep]

    e1 = pci1 - pci2
    e2 = pcj1 - pcj2
    e1 /= np.linalg.norm(e1, axis=1, keepdims=True)
    e2 /= np.linalg.norm(e2, axis=1, keepdims=True)
    acos = lambda x: np.arccos(x.clip(-1, 1))
    alpha = (acos((ni1 * ni2).sum(1)) - acos((nj1 * nj2).sum(1))) ** 2
    beta = (acos((ni1 * e1).sum(1)) - acos((nj1 * e2).sum(1))) ** 2
    gamma = (acos((ni2 * e1).sum(1)) - acos((nj2 * e2).sum(1))) ** 2
    a2 = para["angleThre"] ** 2
    keep = (alpha < a2) & (beta < a2) & (gamma < a2)
    if keep.sum() < 3:
        return np.eye(4)
    idx, idy = idx[keep], idy[keep]
    d2, alpha, beta, gamma = d2[keep], alpha[keep], beta[keep], gamma[keep]

    f1 = wij[corres[0, idy], corres[1, idy]]
    f2 = wij[corres[0, idx], corres[1, idx]]
    w = f1 * f2 * np.exp(
        -d2 / (2 * para["sigmaDist"] ** 2)
        - alpha / (2 * para["sigmaAngle1"] ** 2)
        - beta / (2 * para["sigmaAngle2"] ** 2)
        - gamma / (2 * para["sigmaAngle2"] ** 2))
    ww = (sW[corres[0, idy]] * tW[corres[1, idy]]
          * sW[corres[0, idx]] * tW[corres[1, idx]])
    w[ww != 1] *= 0.6
    if (w != 0).sum() < 1:
        return np.eye(4)

    pi1, pj1 = sPC[corres[0, idy]], tPC[corres[1, idy]]
    pi2, pj2 = sPC[corres[0, idx]], tPC[corres[1, idx]]
    ni1, nj1 = sN[corres[0, idy]], tN[corres[1, idy]]
    ni2, nj2 = sN[corres[0, idx]], tN[corres[1, idx]]
    allSP = np.concatenate([pi1, pi2])
    allTP = np.concatenate([pj1, pj2])
    allSN = np.concatenate([ni1, ni2])
    allTN = np.concatenate([nj1, nj2])
    allWP = np.concatenate([w, w])
    allWN = allWP.copy()

    method = para["method"]
    if method == "horn87":
        return fit_horn87(allSP, allTP, allSN, allTN, allWP, allWN, para["mu"])
    if method == "irls":
        return fit_irls(allSP, allTP, allSN, allTN, allWP, allWN, para["mu"])
    row = corres[0, idy] * nft + corres[1, idy]
    col = corres[0, idx] * nft + corres[1, idx]
    if method == "spectral":
        return fit_spectral(allSP, allTP, allSN, allTN, allWP, allWN, w,
                            para["mu"], row, col, nfs * nft)
    if method == "irls+sm":
        return fit_irls_sm(allSP, allTP, allSN, allTN, allWP, allWN, w,
                           para["mu"], row, col, nfs * nft)
    raise ValueError(method)
