"""Dense golden operators, built independently from the mathematical spec.

These construct the 1-D stencil matrices and their kron-lifted 2-D/3-D
composites as dense numpy arrays, directly from the finite-difference
definitions documented in SURVEY.md §2 (including boundary quirks 1-3).
They are used to verify the matrix-free stencils in ofot_tpu.ops by action
on random vectors.
"""

import numpy as np


def d_central(n, h, bc, weird=False):
    L = np.zeros((n, n))
    for i in range(1, n - 1):
        L[i, i - 1] = -0.5 / h
        L[i, i + 1] = 0.5 / h
    # truncated central rows (the bc='D' behavior)
    L[0, 1] = 0.5 / h
    L[n - 1, n - 2] = -0.5 / h
    if bc == "N":
        L[0, :] = 0.0
        L[-1, :] = 0.0
        if weird:
            # unscaled one-sided boundary rows (quirk 1)
            L[0, 0], L[0, 1] = -1.0, 1.0
            L[-1, -1], L[-1, -2] = 1.0, -1.0
    return L


def d_forward(n, h, bc, weird=False):
    L = np.zeros((n, n))
    for i in range(n - 1):
        L[i, i] = -1.0 / h
        L[i, i + 1] = 1.0 / h
    if weird:
        L[-1, -1], L[-1, -2] = 1.0, -1.0
    elif bc == "D":
        L[-1, -1] = -1.0 / h
    # bc='N': last row stays zero
    return L


def d_backward(n, h, bc, weird=False):
    L = np.zeros((n, n))
    for i in range(1, n):
        L[i, i] = 1.0 / h
        L[i, i - 1] = -1.0 / h
    if weird:
        L[0, 0], L[0, 1] = -1.0, 1.0
    elif bc == "D":
        L[0, 0] = 1.0 / h
    return L


def d_lap(n, h, bc):
    L = np.zeros((n, n))
    for i in range(1, n - 1):
        L[i, i - 1] = 1.0 / h**2
        L[i, i] = -2.0 / h**2
        L[i, i + 1] = 1.0 / h**2
    if bc == "N":
        L[0, 0], L[0, 1] = -1.0 / h**2, 1.0 / h**2
        L[-1, -1], L[-1, -2] = -1.0 / h**2, 1.0 / h**2
    else:
        L[0, 0], L[0, 1] = -2.0 / h**2, 1.0 / h**2
        L[-1, -1], L[-1, -2] = -2.0 / h**2, 1.0 / h**2
    return L


def kron3(A_t, A_y, A_x):
    """kron-lift with time outermost, then y, then x (index = t*Ny*Nx + y*Nx + x)."""
    return np.kron(A_t, np.kron(A_y, A_x))


def grad2d_mat(Nx, Ny, dx, dy, bc, scheme="central"):
    d = {"central": d_central, "forward": d_forward}[scheme]
    Dx = d(Nx, dx, bc)
    Dy = d(Ny, dy, bc)
    Gx = np.kron(np.eye(Ny), Dx)
    Gy = np.kron(Dy, np.eye(Nx))
    return np.vstack([Gx, Gy])


def div2d_mat(Nx, Ny, dx, dy, bc):
    Dx = d_central(Nx, dx, bc)
    Dy = d_central(Ny, dy, bc)
    return np.hstack([np.kron(np.eye(Ny), Dx), np.kron(Dy, np.eye(Nx))])


def grad_st_mat(Nt, Nx, Ny, dt, dx, dy, bc):
    Dt = d_central(Nt, dt, bc, weird=True)
    Dx = d_central(Nx, dx, bc, weird=True)
    Dy = d_central(Ny, dy, bc, weird=True)
    T = kron3(Dt, np.eye(Ny), np.eye(Nx))
    X = kron3(np.eye(Nt), np.eye(Ny), Dx)
    Y = kron3(np.eye(Nt), Dy, np.eye(Nx))
    return np.vstack([T, X, Y])


def div_st_mat(Nt, Nx, Ny, dt, dx, dy, bc):
    Dt = d_central(Nt, dt, bc, weird=True)
    Dx = d_central(Nx, dx, bc, weird=True)
    Dy = d_central(Ny, dy, bc, weird=True)
    T = kron3(Dt, np.eye(Ny), np.eye(Nx))
    X = kron3(np.eye(Nt), np.eye(Ny), Dx)
    Y = kron3(np.eye(Nt), Dy, np.eye(Nx))
    return np.hstack([T, X, Y])


def laplacian_st_mat(Nt, Nx, Ny, dt, dx, dy, bc):
    Lt = d_lap(Nt, dt, bc)
    Lx = d_lap(Nx, dx, bc)
    Ly = d_lap(Ny, dy, bc)
    return (kron3(Lt, np.eye(Ny), np.eye(Nx))
            + kron3(np.eye(Nt), np.eye(Ny), Lx)
            + kron3(np.eye(Nt), Ly, np.eye(Nx)))


def lap_gn_mat(Nx, Ny):
    """lap = div @ grad with div = -grad_forward^T (GN smoothness operator)."""
    G = grad2d_mat(Nx, Ny, 1.0, 1.0, "N", scheme="forward")
    return -G.T @ G
