package graft.sinks

import org.scalacheck.{Arbitrary, Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.sinks.essnapshot.Smile
import graft.sinks.essnapshot.Smile._

/** Round-trip and framing properties of the SMILE codec over RANDOM value
  * trees — the generative complement to SmileSpec's hand-derived golden
  * bytes (pure JVM — no SparkSession). */
object SmileProperties extends Properties("smile") {

  private val genString: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('é', '中', 'ß', '€', 'あ')))
      .map(_.mkString),
    // lengths that straddle every token class boundary (32/33/64/65 ascii,
    // 33/34/65/66 utf8 bytes)
    for {
      n <- Gen.oneOf(0, 1, 31, 32, 33, 63, 64, 65, 100)
      c <- Gen.oneOf('x', 'é')
    } yield c.toString * n)

  private val genLeaf: Gen[SVal] = Gen.oneOf(
    Gen.const(SNull),
    Gen.oneOf(true, false).map(SBool.apply),
    Gen.oneOf(
      Gen.choose(-20L, 20L), // small-int token class boundary straddle
      Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.oneOf(0L, -16L, 15L, 16L, -17L, 63L, 64L,
        Int.MaxValue.toLong, Int.MinValue.toLong,
        Int.MaxValue + 1L, Int.MinValue - 1L)).map(SLong.apply),
    Arbitrary.arbitrary[Double].suchThat(d => !d.isNaN).map(SDouble.apply),
    genString.map(SStr.apply))

  private def genVal(depth: Int): Gen[SVal] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      3 -> genLeaf,
      1 -> Gen.listOfN(3, genVal(depth - 1)).map(SArr.apply),
      1 -> (for {
        keys <- Gen.listOfN(3, genString)
        vals <- Gen.listOfN(3, genVal(depth - 1))
      } yield SObj(keys.zip(vals))))

  property("read(write(v)) == v for random trees") =
    forAll(genVal(3)) { v => Smile.read(Smile.write(v)) == v }

  property("every document leads with the :)\\n header + flags 0") =
    forAll(genVal(2)) { v =>
      val b = Smile.write(v)
      b.length >= 5 && b(0) == 0x3A && b(1) == 0x29 && b(2) == 0x0A && b(3) == 0x00
    }

  property("encoding is deterministic (byte-identical re-encode)") =
    forAll(genVal(3)) { v =>
      java.util.Arrays.equals(Smile.write(v), Smile.write(v))
    }
}
