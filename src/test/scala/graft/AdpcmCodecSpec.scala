package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Multimodal.Adpcm

/** Byte-level laws for the IMA ADPCM codec (no Spark session needed). */
class AdpcmCodecSpec extends AnyFunSuite {

  test("constant signal round-trips exactly") {
    val s = Array.fill(400)(12345.toShort)
    val back = Adpcm.decode(Adpcm.encode(s))
    assert(back.length == 400)
    assert(back.sameElements(s))
  }

  test("compression is 4:1 (4 bits per 16-bit sample + 7-byte header)") {
    val s = Array.tabulate(1000)(i => (i * 13 % 4000).toShort)
    assert(Adpcm.encode(s).length == 7 + 500)
  }

  test("slow sine reconstructs above 25 dB SNR") {
    val s = Array.tabulate(2000)(i =>
      (8000 * math.sin(2 * math.Pi * i / 100)).toShort)
    val back = Adpcm.decode(Adpcm.encode(s))
    var sig = 0.0
    var err = 0.0
    s.indices.foreach { i =>
      sig += s(i).toDouble * s(i)
      val d = s(i) - back(i); err += d.toDouble * d
    }
    val snr = 10 * math.log10(sig / err)
    assert(snr > 25, f"snr $snr%.1f dB")
  }

  test("encode is deterministic") {
    val s = Array.tabulate(500)(i => ((i * 997) % 30000 - 15000).toShort)
    assert(Adpcm.encode(s).sameElements(Adpcm.encode(s)))
  }

  test("step-index adaptation tracks a full-scale square wave") {
    // worst-case transient: +/-32000 alternating every 50 samples; the
    // step table must ramp up to follow — assert bounded settled error
    val s = Array.tabulate(400)(i =>
      (if ((i / 50) % 2 == 0) 32000 else -32000).toShort)
    val back = Adpcm.decode(Adpcm.encode(s))
    // by the end of each 50-sample plateau the predictor has converged
    (49 until 400 by 50).foreach { i =>
      assert(math.abs(s(i) - back(i)) < 2000,
        s"plateau end $i not converged: ${back(i)} vs ${s(i)}")
    }
  }

  test("truncated payloads fail loudly") {
    val enc = Adpcm.encode(Array.fill(100)(5.toShort))
    intercept[IllegalArgumentException] { Adpcm.decode(enc.take(20)) }
    intercept[IllegalArgumentException] { Adpcm.decode(Array[Byte](1, 2)) }
  }
}
