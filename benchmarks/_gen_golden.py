"""Generate golden vectors with a from-scratch affine BLS12-381 G1
implementation sharing NO code or representation with the package (pure
python ints, chord-tangent formulas, Fermat inversion). Output is pasted
into tests/test_golden_vectors.py."""

Q = 4002409555221667393417789825735904156556882819939007885332058136124031650490837864442687629129015664037894272559787
R = 52435875175126190479447740508185965837690552500527637822603658699938581184513
GX = 3685416753713387016781088315183077757961620795782546409894578378688607592378376318836054947676345821548104185464507
GY = 1339506544944476473020471379941921221584933875938349620426543736416511423956333506472724655353366534992391756441569


def add(p, q):
    if p is None:
        return q
    if q is None:
        return p
    x1, y1 = p
    x2, y2 = q
    if x1 == x2:
        if (y1 + y2) % Q == 0:
            return None
        lam = (3 * x1 * x1) * pow(2 * y1, -1, Q) % Q
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, Q) % Q
    x3 = (lam * lam - x1 - x2) % Q
    y3 = (lam * (x1 - x3) - y1) % Q
    return (x3, y3)


def mul(p, k):
    acc = None
    while k:
        if k & 1:
            acc = add(acc, p)
        p = add(p, p)
        k >>= 1
    return acc


def compress(p):
    if p is None:
        return bytes([0xC0]) + bytes(47)
    x, y = p
    b = bytearray(x.to_bytes(48, "big"))
    b[0] |= 0x80
    if y > (Q - 1) // 2:
        b[0] |= 0x20
    return bytes(b)


G = (GX, GY)
LAMBDA = 228988810152649578064853576960394133503  # GLV endomorphism eigenvalue

scalars = [
    1, 2, 3, 4, 5, 7, 8, 255, 256, 65537,
    2**64, 2**128, 2**192, 2**254,
    R - 1, R - 2, (R - 1) // 2, (R + 1) // 2,
    LAMBDA, LAMBDA + 1,
    0xDEADBEEFCAFEBABE1234567890ABCDEF0FEDCBA987654321AABBCCDDEEFF0011 % R,
    0x1FF00FF00FF00FF00FF00FF00FF00FF00FF00FF00FF00FF00FF00FF00FF00FF % R,
]

print("KG_VECTORS = [")
for k in scalars:
    print(f"    ({hex(k)},\n     \"{compress(mul(G, k)).hex()}\"),")
print("]")

# fixed MSM: bases = k_i*G for first 8 scalars, msm scalars fixed
msm_scalars = [3, 1, 4, 1, 5, 9, 2, 6]
bases = [mul(G, k) for k in scalars[:8]]
acc = None
for b, s in zip(bases, msm_scalars):
    acc = add(acc, mul(b, s))
print(f"MSM8 = \"{compress(acc).hex()}\"")

msm_scalars2 = [R - 1, R - 2, 2**200 % R, 1, 0, 12345, 2**254 % R, 7]
acc = None
for b, s in zip(bases, msm_scalars2):
    acc = add(acc, mul(b, s))
print(f"MSM8_BIG = \"{compress(acc).hex()}\"")

# sum of ALL the k*G vectors (exercises additions of unrelated points)
acc = None
for k in scalars:
    acc = add(acc, mul(G, k))
print(f"SUM_ALL = \"{compress(acc).hex()}\"")

# decompression targets: point with "lexicographically largest" y and not
p5 = mul(G, 5)
print(f"# 5G y: {p5[1]}  largest: {p5[1] > (Q-1)//2}")
p7 = mul(G, 7)
print(f"# 7G y: {p7[1]}  largest: {p7[1] > (Q-1)//2}")
print(f"P5_XY = ({p5[0]}, {p5[1]})")
print(f"P7_XY = ({p7[0]}, {p7[1]})")
