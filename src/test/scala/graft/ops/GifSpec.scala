package graft.ops

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.ByteArrayOutputStream

import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier, ImageWriteParam}
import javax.imageio.metadata.IIOMetadataNode

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pure-Scala animated-GIF inter-frame decode ([[Gif]]), cross-validated
  * against the JDK's INDEPENDENT GIF implementation: every fixture here is
  * encoded by `com.sun.imageio`'s GIF writer (Sun's LZW encoder, palette
  * writer, frame metadata), so [[Gif]] reproducing the pixels is a
  * two-implementation agreement, not a self-round-trip. Disposal
  * compositing (the inter-frame part) is additionally pinned against
  * hand-computed GIF89a expectations.
  */
class GifSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  private val Red = 0xffff0000
  private val Green = 0xff00ff00
  private val Blue = 0xff0000ff
  private val White = 0xffffffff
  private val Black = 0xff000000

  /** Indexed image with an exact 4-color palette, so the JDK writer's
    * palette pass cannot quantize the test colors.
    */
  private def indexed(w: Int, h: Int, fill: (Int, Int) => Int): BufferedImage = {
    val colors = Array(Red, Green, Blue, White)
    val cm = new IndexColorModel(2, 4,
      colors.map(c => ((c >> 16) & 0xff).toByte),
      colors.map(c => ((c >> 8) & 0xff).toByte),
      colors.map(c => (c & 0xff).toByte))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, fill(x, y))))
    img
  }

  /** Encode an animated GIF with the JDK writer: per-frame (image, delay
    * in centiseconds, disposal method name, left/top offset).
    */
  private def jdkGif(
      frames: Seq[(BufferedImage, Int, String, (Int, Int))],
      interlace: Boolean = false): Array[Byte] = {
    val writer = ImageIO.getImageWritersBySuffix("gif").next()
    val baos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { case (img, delayCs, disposal, (ox, oy)) =>
      val param = writer.getDefaultWriteParam
      if (interlace) param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
      val meta = writer.getDefaultImageMetadata(new ImageTypeSpecifier(img), param)
      val fmt = "javax_imageio_gif_image_1.0"
      val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      def child(name: String): IIOMetadataNode = {
        var n = root.getFirstChild
        while (n != null && n.getNodeName != name) n = n.getNextSibling
        if (n != null) n.asInstanceOf[IIOMetadataNode]
        else { val c = new IIOMetadataNode(name); root.appendChild(c); c }
      }
      val gce = child("GraphicControlExtension")
      gce.setAttribute("disposalMethod", disposal)
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", delayCs.toString)
      gce.setAttribute("transparentColorIndex", "0")
      val desc = child("ImageDescriptor")
      desc.setAttribute("imageLeftPosition", ox.toString)
      desc.setAttribute("imageTopPosition", oy.toString)
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new IIOImage(img, null, meta), param)
    }
    writer.endWriteSequence()
    ios.close()
    baos.toByteArray
  }

  private def pixels(img: BufferedImage): Seq[Int] =
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      yield img.getRGB(x, y)

  test("probe reads JDK-written structure: size, frame count, delays") {
    val f0 = indexed(6, 4, (_, _) => Red)
    val f1 = indexed(6, 4, (x, _) => if (x < 3) Green else Blue)
    val bytes = jdkGif(Seq(
      (f0, 10, "none", (0, 0)),
      (f1, 25, "none", (0, 0))))
    val meta = Gif.probe(bytes).get
    (meta.width, meta.height) shouldBe (6, 4)
    meta.frames.length shouldBe 2
    meta.frames.map(_.delayMs) shouldBe Vector(100L, 250L)
    meta.durationMs shouldBe 350L
    // frame timeline: 0 on screen for [0,100), 1 from 100
    meta.frameAt(0) shouldBe 0
    meta.frameAt(99) shouldBe 0
    meta.frameAt(100) shouldBe 1
    meta.frameAt(5000) shouldBe 1
  }

  test("LZW cross-validation: this decoder reproduces Sun-encoded frames pixel-for-pixel") {
    // full-rect frames, no transparency, disposal none: the composited
    // canvas at i IS frame i, so pixel equality checks the LZW + palette
    // decode directly against what the independent encoder wrote.
    val fs = Seq(
      indexed(16, 11, (x, y) => Array(Red, Green, Blue, White)((x * y + x) % 4)),
      indexed(16, 11, (x, y) => if ((x + y) % 2 == 0) White else Blue),
      indexed(16, 11, (x, _) => if (x == 7) Green else Red))
    val bytes = jdkGif(fs.map(f => (f, 5, "none", (0, 0))))
    val meta = Gif.probe(bytes).get
    meta.frames.length shouldBe 3
    val decoded = Gif.decodeFrames(bytes, meta, _ => true).toMap
    fs.zipWithIndex.foreach { case (src, i) =>
      withClue(s"frame $i") { pixels(decoded(i)) shouldBe pixels(src) }
    }
  }

  test("interlaced frames deinterlace to the same pixels the JDK reader sees") {
    val src = indexed(9, 13, (x, y) => Array(Red, Green, Blue, White)((3 * y + x) % 4))
    val bytes = jdkGif(Seq((src, 0, "none", (0, 0))), interlace = true)
    val meta = Gif.probe(bytes).get
    meta.frames.head.interlaced shouldBe true
    val mine = Gif.decodeFrames(bytes, meta, _ => true).next()._2
    val jdk = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    pixels(mine) shouldBe pixels(jdk)
  }

  test("disposal compositing: patches, restoreToBackgroundColor and restoreToPrevious") {
    // canvas 4x3; GIF89a semantics hand-computed per frame:
    //   f0 full red, keep
    //   f1 2x1 blue patch at (1,1), restoreToBackgroundColor after display
    //   f2 1x1 green patch at (3,0), restoreToPrevious after display
    //   f3 full white
    val bytes = jdkGif(Seq(
      (indexed(4, 3, (_, _) => Red), 5, "none", (0, 0)),
      (indexed(2, 1, (_, _) => Blue), 5, "restoreToBackgroundColor", (1, 1)),
      (indexed(1, 1, (_, _) => Green), 5, "restoreToPrevious", (3, 0)),
      (indexed(4, 3, (_, _) => White), 5, "none", (0, 0))))
    val meta = Gif.probe(bytes).get
    meta.frames.map(_.disposal) shouldBe Vector(0, 2, 3, 0)
    (meta.frames(1).x, meta.frames(1).y, meta.frames(1).w, meta.frames(1).h) shouldBe (1, 1, 2, 1)
    val d = Gif.decodeFrames(bytes, meta, _ => true).toMap
    def grid(i: Int): Seq[Seq[Int]] = pixels(d(i)).grouped(4).toSeq.map(_.toSeq)
    // while f1 is on screen: red canvas with the blue patch drawn
    grid(1) shouldBe Seq(
      Seq(Red, Red, Red, Red),
      Seq(Red, Blue, Blue, Red),
      Seq(Red, Red, Red, Red))
    // f1 disposed to background (transparent) BEFORE f2 draws its green
    // pixel: the patch rect must be transparent (0), not blue, not red
    grid(2) shouldBe Seq(
      Seq(Red, Red, Red, Green),
      Seq(Red, 0, 0, Red),
      Seq(Red, Red, Red, Red))
    // f2 disposed to PREVIOUS (the post-f1-disposal canvas): green gone,
    // hole still there — then f3 paints everything white
    grid(3) shouldBe Seq(
      Seq(White, White, White, White),
      Seq(White, White, White, White),
      Seq(White, White, White, White))
  }

  test("videoMeta and clip decode route animated GIFs as video, stills as image") {
    val anim = jdkGif(Seq(
      (indexed(8, 8, (_, _) => Red), 10, "none", (0, 0)),
      (indexed(8, 8, (_, _) => Blue), 10, "none", (0, 0))))
    val still = {
      val b = new ByteArrayOutputStream()
      ImageIO.write(indexed(8, 8, (_, _) => Green), "gif", b)
      b.toByteArray
    }
    val media = Seq((1L, anim), (2L, still)).toDF("media_id", "payload")
    val vm = Multimodal.videoMeta(media).collect()
    vm.map(_.getLong(0)).toSeq shouldBe Seq(1L) // still GIF is not a video
    vm.head.getLong(1) shouldBe 200L
    (vm.head.getInt(2), vm.head.getInt(3)) shouldBe (8, 8)
    // clip features = mean over red and blue frames, not the first frame:
    // red luma 0.299, blue luma 0.114 -> mean ~0.2065 in every cell
    val clip = Multimodal.decode(anim)
    clip.foreach(_ shouldBe 0.2065f +- 0.005f)
    // a still GIF must featurize as an IMAGE (green luma 0.587)
    Multimodal.decode(still).foreach(_ shouldBe 0.587f +- 0.005f)
  }

  test("videoFrameFeatures samples GIF frames by clip time through the inter-frame chain") {
    // 4 frames x 100 ms; sample every 150 ms -> times 0,150,300 -> frames 0,1,3
    val colors = Seq(Red, Green, Blue, White)
    val anim = jdkGif(colors.map(c => (indexed(5, 5, (_, _) => c), 10, "none", (0, 0))))
    val media = Seq((7L, anim)).toDF("media_id", "payload")
    val rows = Multimodal.videoFrameFeatures(media, everyMs = 150L)
      .orderBy("frame_idx").collect()
    rows.map(r => (r.getInt(1), r.getLong(2))).toSeq shouldBe Seq((0, 0L), (1, 150L), (3, 300L))
    val lumas = Seq(0.299f, 0.587f, 0.114f) // red, green, (skip blue), white=1 below
    rows(0).getAs[scala.collection.Seq[Float]](3).foreach(_ shouldBe 0.299f +- 0.005f)
    rows(1).getAs[scala.collection.Seq[Float]](3).foreach(_ shouldBe 0.587f +- 0.005f)
    rows(2).getAs[scala.collection.Seq[Float]](3).foreach(_ shouldBe 1.0f +- 0.005f)
  }
}
