package graft.operators.av1

/** Block-geometry / mode / transform constant tables from the AV1
  * Bitstream & Decoding Process Specification (section 9 symbol tables
  * and the 6.8 semantics) — all algorithmically-defined or
  * spec-enumerated data, no extraction needed.
  */
object Av1Consts {

  // ---- block sizes (spec BLOCK_SIZES_ALL order) ----
  // 0:4x4 1:4x8 2:8x4 3:8x8 4:8x16 5:16x8 6:16x16 7:16x32 8:32x16
  // 9:32x32 10:32x64 11:64x32 12:64x64 13:64x128 14:128x64 15:128x128
  // 16:4x16 17:16x4 18:8x32 19:32x8 20:16x64 21:64x16
  val BlockW4: Array[Int] = Array(1, 1, 2, 2, 2, 4, 4, 4, 8, 8, 8, 16,
    16, 16, 32, 32, 1, 4, 2, 8, 4, 16)
  val BlockH4: Array[Int] = Array(1, 2, 1, 2, 4, 2, 4, 8, 4, 8, 16, 8,
    16, 32, 16, 32, 4, 1, 8, 2, 16, 4)

  val BLOCK_4X4 = 0; val BLOCK_8X8 = 3; val BLOCK_16X16 = 6
  val BLOCK_32X32 = 9; val BLOCK_64X64 = 12; val BLOCK_128X128 = 15
  val BLOCK_INVALID = -1

  // partition types
  val PARTITION_NONE = 0; val PARTITION_HORZ = 1; val PARTITION_VERT = 2
  val PARTITION_SPLIT = 3; val PARTITION_HORZ_A = 4
  val PARTITION_HORZ_B = 5; val PARTITION_VERT_A = 6
  val PARTITION_VERT_B = 7; val PARTITION_HORZ_4 = 8
  val PARTITION_VERT_4 = 9

  /** Partition_Subsize[partition][bSize] for square bSize 8..128
    * (indexed here by square rank 1..4 where rank = log2(w4): 8x8 -> 1,
    * 16x16 -> 2, 32x32 -> 3, 64x64 -> 4, 128x128 -> 5).
    * Derived algorithmically from the block enum.
    */
  private val squareBySb = Array(BLOCK_4X4, BLOCK_8X8, BLOCK_16X16,
    BLOCK_32X32, BLOCK_64X64, BLOCK_128X128)

  def squareOfRank(rank: Int): Int = squareBySb(rank)

  /** sub-size of a square block under a partition; -1 when illegal */
  def partitionSubsize(part: Int, sq: Int): Int = {
    // sq is one of the square sizes
    val rank = squareBySb.indexOf(sq)
    part match {
      case PARTITION_NONE => sq
      case PARTITION_SPLIT => squareBySb(rank - 1)
      case PARTITION_HORZ => sq match {
        case BLOCK_8X8 => 2 // 8x4
        case BLOCK_16X16 => 5 // 16x8
        case BLOCK_32X32 => 8 // 32x16
        case BLOCK_64X64 => 11 // 64x32
        case BLOCK_128X128 => 14 // 128x64
        case _ => BLOCK_INVALID
      }
      case PARTITION_VERT => sq match {
        case BLOCK_8X8 => 1 // 4x8
        case BLOCK_16X16 => 4 // 8x16
        case BLOCK_32X32 => 7 // 16x32
        case BLOCK_64X64 => 10 // 32x64
        case BLOCK_128X128 => 13 // 64x128
        case _ => BLOCK_INVALID
      }
      case PARTITION_HORZ_4 => sq match {
        case BLOCK_16X16 => 17 // 16x4
        case BLOCK_32X32 => 19 // 32x8
        case BLOCK_64X64 => 21 // 64x16
        case _ => BLOCK_INVALID
      }
      case PARTITION_VERT_4 => sq match {
        case BLOCK_16X16 => 16 // 4x16
        case BLOCK_32X32 => 18 // 8x32
        case BLOCK_64X64 => 20 // 16x64
        case _ => BLOCK_INVALID
      }
      case _ => BLOCK_INVALID // AB partitions handled explicitly
    }
  }

  // ---- intra prediction modes ----
  val DC_PRED = 0; val V_PRED = 1; val H_PRED = 2; val D45_PRED = 3
  val D135_PRED = 4; val D113_PRED = 5; val D157_PRED = 6
  val D203_PRED = 7; val D67_PRED = 8; val SMOOTH_PRED = 9
  val SMOOTH_V_PRED = 10; val SMOOTH_H_PRED = 11; val PAETH_PRED = 12
  val UV_CFL_PRED = 13
  val INTRA_MODES = 13

  /** spec Mode_To_Angle */
  val ModeToAngle: Array[Int] = Array(0, 90, 180, 45, 135, 113, 157,
    203, 67, 0, 0, 0, 0, 0)

  def isDirectionalMode(m: Int): Boolean = m >= V_PRED && m <= D67_PRED

  /** spec Intra_Mode_Context — mode -> kf-y-mode cdf context */
  val IntraModeContext: Array[Int] =
    Array(0, 1, 2, 3, 4, 4, 4, 4, 3, 0, 1, 2, 0)

  // filter-intra modes
  val FILTER_DC_PRED = 0; val FILTER_V_PRED = 1; val FILTER_H_PRED = 2
  val FILTER_D157_PRED = 3; val FILTER_PAETH_PRED = 4

  // ---- transform sizes (spec TX_SIZES_ALL order) ----
  // 0:4x4 1:8x8 2:16x16 3:32x32 4:64x64 5:4x8 6:8x4 7:8x16 8:16x8
  // 9:16x32 10:32x16 11:32x64 12:64x32 13:4x16 14:16x4 15:8x32 16:32x8
  // 17:16x64 18:64x16
  val TxW: Array[Int] = Array(4, 8, 16, 32, 64, 4, 8, 8, 16, 16, 32,
    32, 64, 4, 16, 8, 32, 16, 64)
  val TxH: Array[Int] = Array(4, 8, 16, 32, 64, 8, 4, 16, 8, 32, 16,
    64, 32, 16, 4, 32, 8, 64, 16)
  val TX_4X4 = 0; val TX_8X8 = 1; val TX_16X16 = 2; val TX_32X32 = 3
  val TX_64X64 = 4

  /** spec Tx_Size_Sqr (clamp to square of the smaller dim) */
  val TxSizeSqr: Array[Int] = Array(0, 1, 2, 3, 4, 0, 0, 1, 1, 2, 2,
    3, 3, 0, 0, 1, 1, 2, 2)
  /** spec Tx_Size_Sqr_Up (square of the larger dim) */
  val TxSizeSqrUp: Array[Int] = Array(0, 1, 2, 3, 4, 1, 1, 2, 2, 3, 3,
    4, 4, 2, 2, 3, 3, 4, 4)

  /** spec Max_Tx_Size_Rect[bSize]: the largest rect tx fitting the
    * block (64x64 cap).
    */
  val MaxTxSizeRect: Array[Int] = Array(
    0, // 4x4
    5, // 4x8
    6, // 8x4
    1, // 8x8
    7, // 8x16
    8, // 16x8
    2, // 16x16
    9, // 16x32
    10, // 32x16
    3, // 32x32
    11, // 32x64
    12, // 64x32
    4, // 64x64
    4, // 64x128 -> 64x64
    4, // 128x64
    4, // 128x128
    13, // 4x16
    14, // 16x4
    15, // 8x32
    16, // 32x8
    17, // 16x64
    18) // 64x16

  /** spec Split_Tx_Size: the size one depth step down */
  val SplitTxSize: Array[Int] = Array(
    0, 0, 1, 2, 3, // 4x4 8x8->4x4 16->8 32->16 64->32
    0, 0, // 4x8,8x4 -> 4x4
    1, 1, // 8x16,16x8 -> 8x8
    2, 2, // 16x32,32x16 -> 16x16
    3, 3, // 32x64,64x32 -> 32x32
    5, 6, // 4x16 -> 4x8, 16x4 -> 8x4
    7, 8, // 8x32 -> 8x16, 32x8 -> 16x8
    9, 10) // 16x64 -> 16x32, 64x16 -> 32x16

  /** spec Tx_Size_Cat for the tx-depth cdf: categories by max square */
  def txSizeCat(bSize: Int): Int = {
    val maxRect = MaxTxSizeRect(bSize)
    TxSizeSqrUp(maxRect) - 1 // 8x8-max -> 0 ... 64-max -> 3
  }

  /** max tx depth per block size (spec Max_Tx_Depth) */
  def maxTxDepth(bSize: Int): Int = {
    val w = BlockW4(bSize) * 4
    val h = BlockH4(bSize) * 4
    val mx = math.max(w, h)
    if (mx == 4) 0
    else if (mx == 8) 1
    else if (mx == 16) 2
    else if (mx == 32) 3
    else 4
  }

  // ---- transform types ----
  val DCT_DCT = 0; val ADST_DCT = 1; val DCT_ADST = 2; val ADST_ADST = 3
  val FLIPADST_DCT = 4; val DCT_FLIPADST = 5; val FLIPADST_FLIPADST = 6
  val ADST_FLIPADST = 7; val FLIPADST_ADST = 8; val IDTX = 9
  val V_DCT = 10; val H_DCT = 11; val V_ADST = 12; val H_ADST = 13
  val V_FLIPADST = 14; val H_FLIPADST = 15

  /** tx set for INTRA blocks (spec get_ext_tx_set_type with is_inter=0)
    * 0 = DCT only, 1 = DTT4+IDTX+1DDCT (7 syms), 2 = DTT4+IDTX (5 syms)
    */
  def intraTxSet(txSz: Int, reducedTxSet: Boolean): Int = {
    val sqUp = TxSizeSqrUp(txSz)
    if (sqUp >= TX_32X32) 0 // spec: intra at 32x32-and-up is DCT only
    else if (reducedTxSet) 2
    else if (TxSizeSqr(txSz) == TX_16X16) 2
    else 1
  }

  /** symbol order for intra set 1 (spec Ext_Tx_Set table,
    * EXT_TX_SET_DTT4_IDTX_1DDCT): index -> tx type
    */
  val TxSet1: Array[Int] = Array(IDTX, DCT_DCT, V_DCT, H_DCT,
    ADST_ADST, ADST_DCT, DCT_ADST)
  /** set 2 (EXT_TX_SET_DTT4_IDTX) */
  val TxSet2: Array[Int] = Array(IDTX, DCT_DCT, ADST_ADST, ADST_DCT,
    DCT_ADST)

  /** spec Mode_To_Txfm: intra mode -> implied tx type (used for chroma
    * and when no symbol is coded)
    */
  val ModeToTxfm: Array[Int] = Array(
    DCT_DCT, // DC
    ADST_DCT, // V
    DCT_ADST, // H
    DCT_DCT, // D45
    ADST_ADST, // D135
    ADST_DCT, // D113
    DCT_ADST, // D157
    DCT_ADST, // D203
    ADST_DCT, // D67
    ADST_ADST, // SMOOTH
    ADST_DCT, // SMOOTH_V
    DCT_ADST, // SMOOTH_H
    ADST_ADST, // PAETH
    DCT_DCT) // CFL (uses DC semantics)

  // tx classes
  val TX_CLASS_2D = 0; val TX_CLASS_HORIZ = 1; val TX_CLASS_VERT = 2
  def txClass(txType: Int): Int = txType match {
    case V_DCT | V_ADST | V_FLIPADST => TX_CLASS_VERT
    case H_DCT | H_ADST | H_FLIPADST => TX_CLASS_HORIZ
    case _ => TX_CLASS_2D
  }

  // ---- quantizer helpers ----
  def qContext(baseQIdx: Int): Int =
    if (baseQIdx <= 20) 0
    else if (baseQIdx <= 60) 1
    else if (baseQIdx <= 120) 2
    else 3
}
