package graft.ops

/** An embedded snapshot SUBSET of the Public Suffix List
  * (publicsuffix.org/list/) in its NATIVE file format — comments,
  * section markers, normal rules, wildcard rules (`*.ck`), and
  * exception rules (`!www.ck`) — so [[Psl.parse]] exercises exactly
  * the grammar the full ~9k-entry file uses and the production list is
  * a drop-in text swap (same parser, same broadcast lookup, nothing
  * else changes). ~240 entries chosen to cover every RULE SHAPE the
  * full list contains: 1/2/3-label normal rules, every wildcard family
  * with exceptions (the `*.ck`/`!www.ck` and Japanese city patterns),
  * and a private-domains section (github.io-style platform suffixes).
  *
  * This is deliberately NOT claimed to be the complete list: the
  * sandbox has no egress, so completeness is a deploy-time data swap,
  * not a code property. Resolution semantics over whatever rules are
  * loaded are the spec's: all matching rules considered, exception
  * prevails, else most labels wins, else the implicit `*` default.
  */
object PslSnapshot {

  val text: String =
    """// Public Suffix List snapshot subset (publicsuffix.org, MPL 2.0).
      |// Format: one rule per line; '!' = exception rule; '*' = wildcard
      |// label; '//' = comment. Divided into ICANN and PRIVATE sections.
      |
      |// ===BEGIN ICANN DOMAINS===
      |
      |// generic TLDs
      |com
      |net
      |org
      |edu
      |gov
      |mil
      |int
      |arpa
      |info
      |biz
      |name
      |mobi
      |pro
      |app
      |dev
      |page
      |cloud
      |online
      |site
      |store
      |tech
      |xyz
      |blog
      |wiki
      |link
      |live
      |news
      |club
      |shop
      |art
      |
      |// ac : Ascension Island
      |ac
      |com.ac
      |edu.ac
      |gov.ac
      |net.ac
      |mil.ac
      |org.ac
      |
      |// ae : United Arab Emirates
      |ae
      |co.ae
      |net.ae
      |org.ae
      |sch.ae
      |ac.ae
      |gov.ae
      |
      |// ai : Anguilla
      |ai
      |off.ai
      |com.ai
      |net.ai
      |org.ai
      |
      |// at : Austria
      |at
      |ac.at
      |co.at
      |gv.at
      |or.at
      |
      |// au : Australia
      |au
      |com.au
      |net.au
      |org.au
      |edu.au
      |gov.au
      |asn.au
      |id.au
      |
      |// bd : Bangladesh (wildcard family: every label under bd is public)
      |*.bd
      |
      |// be : Belgium
      |be
      |ac.be
      |
      |// br : Brazil
      |br
      |com.br
      |net.br
      |org.br
      |gov.br
      |edu.br
      |mil.br
      |art.br
      |
      |// ca : Canada
      |ca
      |ab.ca
      |bc.ca
      |on.ca
      |qc.ca
      |gc.ca
      |
      |// cc : Cocos Islands
      |cc
      |
      |// ch : Switzerland
      |ch
      |
      |// ck : Cook Islands (wildcard with exception: www.ck is registrable)
      |*.ck
      |!www.ck
      |
      |// cn : China
      |cn
      |com.cn
      |net.cn
      |org.cn
      |gov.cn
      |edu.cn
      |ac.cn
      |
      |// co : Colombia
      |co
      |com.co
      |net.co
      |org.co
      |edu.co
      |gov.co
      |
      |// de : Germany
      |de
      |
      |// dk : Denmark
      |dk
      |
      |// er : Eritrea (wildcard)
      |*.er
      |
      |// es : Spain
      |es
      |com.es
      |org.es
      |edu.es
      |gob.es
      |
      |// fi : Finland
      |fi
      |
      |// fk : Falkland Islands (wildcard)
      |*.fk
      |
      |// fr : France
      |fr
      |asso.fr
      |com.fr
      |gouv.fr
      |nom.fr
      |prd.fr
      |tm.fr
      |
      |// in : India
      |in
      |co.in
      |net.in
      |org.in
      |firm.in
      |gen.in
      |ind.in
      |ac.in
      |edu.in
      |gov.in
      |
      |// io : British Indian Ocean Territory
      |io
      |com.io
      |
      |// it : Italy
      |it
      |edu.it
      |gov.it
      |
      |// jp : Japan (3-label geographic wildcards with city exceptions)
      |jp
      |ac.jp
      |ad.jp
      |co.jp
      |ed.jp
      |go.jp
      |gr.jp
      |lg.jp
      |ne.jp
      |or.jp
      |*.kawasaki.jp
      |*.kitakyushu.jp
      |*.kobe.jp
      |*.nagoya.jp
      |*.sapporo.jp
      |*.sendai.jp
      |*.yokohama.jp
      |!city.kawasaki.jp
      |!city.kitakyushu.jp
      |!city.kobe.jp
      |!city.nagoya.jp
      |!city.sapporo.jp
      |!city.sendai.jp
      |!city.yokohama.jp
      |
      |// kr : South Korea
      |kr
      |co.kr
      |ne.kr
      |or.kr
      |re.kr
      |go.kr
      |ac.kr
      |
      |// me : Montenegro
      |me
      |co.me
      |net.me
      |org.me
      |
      |// mm : Myanmar (wildcard)
      |*.mm
      |
      |// mx : Mexico
      |mx
      |com.mx
      |org.mx
      |net.mx
      |edu.mx
      |gob.mx
      |
      |// nl : Netherlands
      |nl
      |
      |// no : Norway
      |no
      |
      |// np : Nepal (wildcard)
      |*.np
      |
      |// nz : New Zealand
      |nz
      |ac.nz
      |co.nz
      |geek.nz
      |gen.nz
      |govt.nz
      |net.nz
      |org.nz
      |school.nz
      |
      |// pg : Papua New Guinea (wildcard)
      |*.pg
      |
      |// pl : Poland
      |pl
      |com.pl
      |net.pl
      |org.pl
      |edu.pl
      |gov.pl
      |
      |// ru : Russia
      |ru
      |ac.ru
      |edu.ru
      |gov.ru
      |int.ru
      |mil.ru
      |
      |// se : Sweden
      |se
      |
      |// tv : Tuvalu
      |tv
      |
      |// uk : United Kingdom
      |uk
      |ac.uk
      |co.uk
      |gov.uk
      |ltd.uk
      |me.uk
      |net.uk
      |nhs.uk
      |org.uk
      |plc.uk
      |police.uk
      |sch.uk
      |
      |// us : United States
      |us
      |dni.us
      |fed.us
      |isa.us
      |kids.us
      |nsn.us
      |
      |// ws : Samoa
      |ws
      |com.ws
      |net.ws
      |org.ws
      |gov.ws
      |edu.ws
      |
      |// za : South Africa
      |za
      |ac.za
      |co.za
      |edu.za
      |gov.za
      |law.za
      |mil.za
      |net.za
      |org.za
      |web.za
      |
      |// ===END ICANN DOMAINS===
      |// ===BEGIN PRIVATE DOMAINS===
      |
      |// GitHub
      |github.io
      |githubusercontent.com
      |
      |// GitLab
      |gitlab.io
      |
      |// Google
      |blogspot.com
      |appspot.com
      |
      |// Amazon
      |s3.amazonaws.com
      |compute.amazonaws.com
      |elb.amazonaws.com
      |
      |// Netlify / Vercel / Heroku
      |netlify.app
      |vercel.app
      |herokuapp.com
      |
      |// ===END PRIVATE DOMAINS===
      |""".stripMargin
}
