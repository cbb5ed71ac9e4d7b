package graft

import graft.ingest.MappingValidator._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the metadata-plane pure functions — total
  * on arbitrary input, idempotent where the reference's normalization
  * contract requires it (validate_mapping.py:50-58).
  */
object ValidatorPropertiesSpec extends Properties("MappingValidator") {

  private val identGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf(' ', '-', '_', '.'))).map(_.mkString)

  property("normalizeIdent idempotent, no spaces/dashes/uppercase") =
    forAll(identGen) { s =>
      val once = normalizeIdent(s)
      normalizeIdent(once) == once &&
        !once.contains(" ") && !once.contains("-") &&
        once == once.toLowerCase
    }

  // note: dash↔space equivalence holds only for interior characters —
  // trim runs first (same order as the reference), so edge dashes
  // survive where edge spaces do not
  property("normalizeIdent equates reference-equal forms") =
    forAll(identGen) { s =>
      normalizeIdent(s.toUpperCase) == normalizeIdent(s.toLowerCase) &&
        normalizeIdent(s"  $s  ") == normalizeIdent(s) &&
        normalizeIdent(s"a${s}z".replace('-', ' ')) == normalizeIdent(s"a${s}z")
    }

  property("batchIdOf finds the BATCH + 6 digit stem") = {
    val digits6 = Gen.listOfN(6, Gen.numChar).map(_.mkString)
    forAll(Gen.alphaStr, digits6) { (pre, d) =>
      batchIdOf(s"${pre}_BATCH${d}_x.csv") == Some(s"BATCH$d") &&
        batchIdOf("BATCH12345") == None &&
        batchIdOf("batch123456") == None
    }
  }

  property("isIdColumn accepts the heuristic forms only") =
    forAll(Gen.alphaLowerStr.suchThat(_.nonEmpty)) { base =>
      isIdColumn(s"${base}_id") && isIdColumn(s"id_$base") &&
        isIdColumn("id") && isIdColumn("xid") &&
        !isIdColumn("idx") && !isIdColumn("grid_x")
    }
}
